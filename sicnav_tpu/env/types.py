"""Core dataclasses: static env configuration and the dynamic sim state pytree.

The reference keeps all of this as mutable attributes on a gym.Env
(crowd_sim_plus/envs/crowd_sim_plus.py) plus per-agent Python objects
(agent_plus.py / human_plus.py). Here the configuration is a frozen,
hashable dataclass (usable as a jit static argument) and the entire world
state is one NamedTuple pytree with fixed shapes — batched environments are
just ``jax.vmap`` / sharded axes over the same pytree.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

# scenario rules (parity: crowd_sim_plus.py:322-451)
SCENARIOS = (
    "circle_crossing", "square_crossing", "hallway", "hallway_static",
    "hallway_static_with_back", "hallway_bottleneck", "hallway_squeeze",
    "rectangle", "left_wall", "no_walls",
)

HUMAN_POLICIES = ("orca", "orca_plus", "sfm", "linear")


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    """Reward terms; ``None`` disables a term (parity with the reference's
    reward-dict gating, crowd_sim_plus.py:88-130). Defaults = sicnav
    env.config [reward] plus the non-SB3 fill-ins."""
    success_reward: Optional[float] = 1.0
    collision_penalty: Optional[float] = -0.25
    freezing_penalty: Optional[float] = -0.125
    timeout: Optional[float] = -1.0
    wall_collision_penalty: Optional[float] = -1.0
    discomfort_dist: float = 0.2
    discomfort_penalty_factor: Optional[float] = 0.5
    progress_factor: Optional[float] = None
    angular_smoothness_factor: Optional[float] = None
    linear_smoothness_factor: Optional[float] = None

    @property
    def discomfort(self) -> bool:
        return self.discomfort_penalty_factor is not None


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (hashable; safe as jit static arg).

    Field defaults mirror sicnav/configs/env.config.
    """
    # [env]
    time_limit: float = 15.0
    dt: float = 0.25
    randomize_attributes: bool = True
    val_size: int = 100
    test_size: int = 500
    # [sim]
    scenario: str = "hallway_bottleneck"
    square_width: float = 5.0
    circle_radius: float = 1.5
    rect_width: float = 2.0
    rect_height: float = 4.0
    starts_moving: int = 10
    human_num: int = 3
    max_humans: int = 8
    # [humans]
    human_policy: str = "orca_plus"
    human_radius: float = 0.30
    human_v_pref: float = 1.5
    human_visible: bool = True
    human_fully_observable: bool = False
    safety_space: float = 0.01
    # sfm params
    sfm_A: float = 3.0
    sfm_B: float = 0.18
    sfm_KI: float = 1.0
    sfm_A_static: float = 2.0
    sfm_B_static: float = 0.025
    sfm_A_bottleneck: float = 6.0
    sfm_B_bottleneck: float = 0.12
    # orca policy params (class defaults in orca.py:58-66; orca_plus only
    # overrides radius/safety_space from config)
    orca_neighbor_dist: float = 10.0
    orca_max_neighbors: int = 10
    orca_time_horizon: float = 2.0
    orca_time_horizon_obst: float = 0.5
    orca_max_speed: float = 1.0
    # [robot]
    robot_radius: float = 0.25
    robot_v_pref: float = 1.0
    robot_visible: bool = True
    robot_kinematics: str = "unicycle"  # "holonomic" | "unicycle"
    # rewards
    rewards: RewardConfig = dataclasses.field(default_factory=RewardConfig)
    detailed_reward: bool = False

    def __post_init__(self):
        assert self.scenario in SCENARIOS, self.scenario
        assert self.human_policy in HUMAN_POLICIES, self.human_policy
        assert self.robot_kinematics in ("holonomic", "unicycle")

    @property
    def n_walls(self) -> int:
        return {
            "hallway": 2, "hallway_bottleneck": 4, "hallway_squeeze": 4,
            "hallway_static": 12, "hallway_static_with_back": 14,
            "rectangle": 4, "left_wall": 1,
        }.get(self.scenario, 0)

    @property
    def wall_slots(self) -> int:
        # fixed padded wall-array size (>=1 so shapes stay non-empty)
        return max(self.n_walls, 1)


class DoorParams(NamedTuple):
    """Hallway door geometry for intermediate human goals
    (parity: crowd_sim_plus.py:333-345 + human_plus.get_g_xy)."""
    has_door: jnp.ndarray      # bool: scenario in hallway_static*/bottleneck
    x_mid: jnp.ndarray
    y_min: jnp.ndarray
    y_max: jnp.ndarray
    y_mid_min: jnp.ndarray
    y_mid_max: jnp.ndarray
    width: jnp.ndarray


class SimState(NamedTuple):
    """Complete world state; one pytree, fixed shapes, vmappable."""
    # robot
    r_pos: jnp.ndarray          # (2,)
    r_vel: jnp.ndarray          # (2,)
    r_theta: jnp.ndarray        # ()
    r_omega: jnp.ndarray        # ()
    r_goal: jnp.ndarray         # (2,)
    r_radius: jnp.ndarray       # ()
    r_v_pref: jnp.ndarray       # ()
    # humans, padded to H = max_humans
    h_pos: jnp.ndarray          # (H, 2)
    h_vel: jnp.ndarray          # (H, 2)
    h_theta: jnp.ndarray        # (H,)
    h_goal: jnp.ndarray         # (H, 2)   current (possibly intermediate) goal
    h_final_goal: jnp.ndarray   # (H, 2)
    h_radius: jnp.ndarray       # (H,)
    h_v_pref: jnp.ndarray       # (H,)
    h_mask: jnp.ndarray         # (H,) bool
    # static obstacles, padded to W = wall_slots
    walls: jnp.ndarray          # (W, 2, 2)
    wall_mask: jnp.ndarray      # (W,) bool
    door: DoorParams
    # bookkeeping
    t: jnp.ndarray              # () global time
    step_idx: jnp.ndarray       # () int32
    prev_dist_to_goal: jnp.ndarray  # ()
    prev_ang: jnp.ndarray       # () previous action angular component
    has_prev_ang: jnp.ndarray   # () bool
    prev_lin: jnp.ndarray       # ()
    has_prev_lin: jnp.ndarray   # () bool
    human_times: jnp.ndarray    # (H,)
    done: jnp.ndarray           # () bool


class StepInfo(NamedTuple):
    """Per-step reward decomposition + event flags (parity: the info-object
    dict the reference step() returns, crowd_sim_plus.py:1096-1172 and
    info_plus.py)."""
    reach_goal: jnp.ndarray         # bool
    timeout: jnp.ndarray            # bool
    collision: jnp.ndarray          # bool
    wall_collision: jnp.ndarray     # bool
    frozen: jnp.ndarray             # bool
    danger: jnp.ndarray             # bool (dmin < discomfort_dist)
    dmin: jnp.ndarray               # float
    # reward components (0 when inactive)
    r_success: jnp.ndarray
    r_timeout: jnp.ndarray
    r_collision: jnp.ndarray
    r_wall: jnp.ndarray
    r_danger: jnp.ndarray
    r_progress: jnp.ndarray
    r_freezing: jnp.ndarray
    r_angular: jnp.ndarray
    r_linear: jnp.ndarray
    total_reward: jnp.ndarray
    done: jnp.ndarray               # bool
