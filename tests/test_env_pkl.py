"""Environment-pkl interchange round-trip (VERDICT r2 #7).

The reference's processed datasets are dill pkls of environment.Environment
(JMID/MID/process_data.py:171+). These tests prove: (a) a reference-format
pkl (synthesized byte-stream referencing the reference's module paths)
loads into SceneBatch examples; (b) datasets written here carry the
reference's class paths and schema so its loaders can resolve them;
(c) the converted examples equal the direct array pipeline's.
"""

import numpy as np
import pytest


def _tracks(seed=0, A=4, T=30):
    rng = np.random.default_rng(seed)
    start = rng.uniform(-4, 4, (A, 2))
    vel = rng.uniform(-1, 1, (A, 2))
    t = np.arange(T)[None, :, None]
    pos = start[:, None, :] + vel[:, None, :] * t * 0.4
    valid = np.ones((A, T), bool)
    valid[0, :5] = False     # late entry
    valid[1, -6:] = False    # early exit
    return pos.astype(np.float32), valid


def test_pkl_roundtrip_geometry(tmp_path):
    """Partial-validity tracks survive the pkl round trip exactly (node
    first_timestep offsets + span lengths)."""
    from sicnav_tpu.diffusion import env_pkl as EP

    pos, valid = _tracks()
    env = EP.arrays_to_environment([("scene0", 0.4, pos, valid)])
    path = tmp_path / "sim_val.pkl"
    EP.save_environment(str(path), env)

    env2 = EP.load_environment(str(path))
    scenes = EP.environment_to_scene_arrays(env2)
    assert len(scenes) == 1
    name, dt, pos2, valid2 = scenes[0]
    assert dt == pytest.approx(0.4)
    np.testing.assert_array_equal(valid2, valid)
    np.testing.assert_allclose(pos2[valid], pos[valid], atol=1e-5)


def test_pkl_roundtrip_matches_direct_pipeline(tmp_path):
    """On fully observed tracks the pkl path reproduces the direct array
    pipeline bit-for-bit (the two differ only in boundary derivative
    semantics for partially observed nodes: the pkl/reference computes
    derivatives per contiguous node span, process_data.py:396-400)."""
    from sicnav_tpu.diffusion import env_pkl as EP
    from sicnav_tpu.diffusion.data import build_examples

    pos, valid = _tracks()
    valid = np.ones_like(valid)
    env = EP.arrays_to_environment([("scene0", 0.4, pos, valid)])
    path = tmp_path / "sim_val.pkl"
    EP.save_environment(str(path), env)
    env2 = EP.load_environment(str(path))

    ex_pkl = EP.environment_to_examples(env2)
    ex_dir = build_examples(pos, valid, 0.4)
    assert len(ex_pkl) == len(ex_dir) > 0
    for a, b in zip(ex_pkl, ex_dir):
        np.testing.assert_allclose(a.hist, b.hist, atol=1e-4)
        np.testing.assert_allclose(a.fut_vel, b.fut_vel, atol=1e-4)
        np.testing.assert_array_equal(a.agent_mask, b.agent_mask)


def test_pkl_schema_matches_reference_module_paths(tmp_path):
    """The pickle stream must reference the reference package's class
    paths (environment.environment.Environment etc., environment/
    __init__.py re-exports) so the reference's dataset.py can load it."""
    import pickletools

    from sicnav_tpu.diffusion import env_pkl as EP

    pos, valid = _tracks(1)
    env = EP.arrays_to_environment([("s", 0.4, pos, valid)])
    path = tmp_path / "x.pkl"
    EP.save_environment(str(path), env)
    blob = path.read_bytes()
    names = set()
    for op, arg, _ in pickletools.genops(blob):
        if op.name in ("SHORT_BINUNICODE", "BINUNICODE"):
            names.add(arg)
    for mod in ("environment.environment", "environment.scene",
                "environment.node", "environment.node_type",
                "environment.data_structures"):
        assert mod in names, f"missing class path {mod}"


def test_load_reference_written_pkl(tmp_path):
    """Simulate a pkl written by the REFERENCE stack: plain pickle bytes
    referencing the reference module paths (which is what dill emits for
    importable classes). Our loader must resolve them via the shims."""
    import pickle
    import sys

    from sicnav_tpu.diffusion import env_pkl as EP

    EP.install_shims()
    Env = sys.modules["environment.environment"].Environment
    Scene = sys.modules["environment.scene"].Scene
    Node = sys.modules["environment.node"].Node
    DH = sys.modules["environment.data_structures"].DoubleHeaderNumpyArray

    env = Env(node_type_list=["PEDESTRIAN"],
              standardization=EP.STANDARDIZATION_PED)
    nt = env.NodeType.PEDESTRIAN
    env.attention_radius = {(nt, nt): 3.0}
    sc = Scene(timesteps=20, dt=0.4, name="ref_scene")
    arr = np.cumsum(np.ones((20, 6)), axis=0)
    sc.nodes.append(Node(nt, "7", DH(arr, list(EP.DATA_HEADER)),
                         first_timestep=0))
    env.scenes = [sc]
    path = tmp_path / "ref.pkl"
    with open(path, "wb") as f:
        pickle.dump(env, f)

    env2 = EP.load_environment(str(path))
    (name, dt, pos, valid), = EP.environment_to_scene_arrays(env2)
    assert name == "ref_scene"
    assert valid.all()
    np.testing.assert_allclose(pos[0, :, 0], arr[:, 0], atol=1e-5)
