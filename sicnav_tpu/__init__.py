"""sicnav_tpu — a TPU-native (JAX/XLA/Pallas/pjit) crowd-navigation framework.

Re-implements the capabilities of sepsamavi/safe-interactive-crowdnav
(SICNav, T-RO 2024; SICNav-Diffusion, RA-L 2025) as a pure-functional,
batched, on-device stack:

- ``sicnav_tpu.ops``        — geometry + batched ORCA kernels (replaces Python-RVO2)
- ``sicnav_tpu.env``        — CrowdSimPlus-equivalent vmappable simulator
- ``sicnav_tpu.policies``   — human/robot policies (ORCA, SFM, linear, DWA)
- ``sicnav_tpu.mpc``        — SICNav bilevel CAMPC as batched fixed-iteration SQP
- ``sicnav_tpu.diffusion``  — JMID/iMID joint diffusion trajectory predictor (Flax)
- ``sicnav_tpu.rl``         — SARL/RGL DQN over vectorized envs
- ``sicnav_tpu.parallel``   — mesh/sharding helpers (pjit/shard_map over ICI)
"""

__version__ = "0.1.0"
