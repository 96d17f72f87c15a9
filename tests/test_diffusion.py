"""JMID/iMID tests: schedule parity, loss/sampling shapes, KDE ranking,
metrics, small-training sanity, forecaster plumbing."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sicnav_tpu.diffusion import data as D
from sicnav_tpu.diffusion import diffusion as DF
from sicnav_tpu.diffusion import evaluation as EV
from sicnav_tpu.diffusion import kde
from sicnav_tpu.diffusion.models import ModelConfig
from sicnav_tpu.diffusion.mid import JMIDModel, TrainConfig, make_train_state, train_step

CFG = ModelConfig(context_dim=32, enc_rnn_dim=16, tf_layer=1,
                  history_len=6, horizon=8)


def _synthetic_batches(n_scenes=4, A=3, T=40, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_scenes):
        p0 = rng.uniform(-3, 3, (A, 1, 2))
        v = rng.uniform(-1, 1, (A, 1, 2))
        ts = np.arange(T)[None, :, None] * 0.25
        pos = p0 + v * ts
        out += D.build_examples(pos, np.ones((A, T), bool), 0.25,
                                history_len=6, horizon=8, stride=10)
    return out


def test_schedule_parity():
    s = DF.make_schedule(100)
    assert s.betas.shape == (101,)
    assert float(s.betas[0]) == 0.0
    np.testing.assert_allclose(float(s.betas[1]), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s.betas[100]), 5e-2, rtol=1e-5)
    # alpha_bar decreasing in (0, 1]
    ab = np.asarray(s.alpha_bars)
    assert ab[0] == 1.0 and np.all(np.diff(ab) <= 0) and ab[-1] > 0


def test_ddim_sampling_shapes_and_determinism():
    s = DF.make_schedule(100)
    ctx = jnp.ones((3, 8))
    net = lambda x, beta, c: 0.1 * x   # trivial eps net
    out1 = DF.sample(net, s, jax.random.PRNGKey(0), 5, ctx, horizon=8,
                     sampling="ddim", stride=2)
    out2 = DF.sample(net, s, jax.random.PRNGKey(0), 5, ctx, horizon=8,
                     sampling="ddim", stride=2)
    assert out1.shape == (5, 3, 8, 2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = DF.sample(net, s, jax.random.PRNGKey(0), 4, ctx, horizon=8,
                     sampling="ddpm", stride=1)
    assert out3.shape == (4, 3, 8, 2)
    assert np.isfinite(np.asarray(out3)).all()


@pytest.mark.slow
def test_kde_ranking_prefers_mode():
    # 19 clustered samples + 1 far outlier: outlier must rank last
    rng = np.random.default_rng(0)
    S, H, T = 20, 2, 8
    fc = rng.normal(0, 0.05, (S, H, T, 2))
    fc[7] += 5.0   # outlier sample
    top, lw = kde.most_likely_samples(jnp.asarray(fc), 5, joint=True)
    assert top.shape == (H, 5, T, 2)
    assert np.abs(np.asarray(top)).max() < 3.0   # outlier excluded
    assert lw.shape == (H, 5)
    np.testing.assert_allclose(np.exp(np.asarray(lw[0])).sum(), 1.0, atol=1e-4)
    top_i, lw_i = kde.most_likely_samples(jnp.asarray(fc), 5, joint=False)
    assert top_i.shape == (H, 5, T, 2)
    assert np.abs(np.asarray(top_i)).max() < 3.0


def test_metrics():
    pred = jnp.zeros((4, 8, 2))
    gt = jnp.ones((8, 2))
    a, f = EV.min_ade_fde(pred, gt)
    np.testing.assert_allclose(float(a), np.sqrt(2), rtol=1e-5)
    np.testing.assert_allclose(float(f), np.sqrt(2), rtol=1e-5)
    nll = EV.kde_nll(jnp.asarray(np.random.default_rng(0).normal(size=(50, 8, 2))),
                     jnp.zeros((8, 2)))
    assert np.isfinite(float(nll))


def test_kde_nll_scipy_parity():
    """Bit-parity with the reference's compute_kde_nll (evaluation.py:
    191-233): scipy.gaussian_kde per timestep, logpdf clipped at -20 before
    the average, NaN on singular covariance (LinAlgError path)."""
    from scipy.stats import gaussian_kde
    rng = np.random.default_rng(3)
    S, T = 30, 8
    pred = rng.normal(size=(S, T, 2)) * rng.uniform(0.2, 2.0, (1, T, 1))
    gt = rng.normal(size=(T, 2)) * 2.0    # some timesteps land in the tail
    ref_ll = 0.0
    for t in range(T):
        kde = gaussian_kde(pred[:, t].T)
        ref_ll += max(float(kde.logpdf(gt[t].T)[0]), -20.0) / T
    ours = float(EV.kde_nll(jnp.asarray(pred, jnp.float32),
                            jnp.asarray(gt, jnp.float32)))
    np.testing.assert_allclose(ours, -ref_ll, rtol=2e-4)

    # degenerate: all samples identical at one timestep -> reference's
    # gaussian_kde raises LinAlgError -> kde_ll = nan
    pred_deg = pred.copy()
    pred_deg[:, 2] = pred_deg[0, 2]
    assert np.isnan(float(EV.kde_nll(jnp.asarray(pred_deg, jnp.float32),
                                     jnp.asarray(gt, jnp.float32))))


def test_build_examples_compacts_sparse_agent_slots():
    """ETH-style concatenated sequences carry many track ids with few
    present at any timestep; windows must keep the PRESENT agents when
    truncating to max_agents (not the first slots)."""
    A, T = 30, 40
    pos = np.random.default_rng(0).normal(size=(A, T, 2))
    valid = np.zeros((A, T), bool)
    valid[20:27, :] = True          # only late slots are ever present
    ex = D.build_examples(pos, valid, 0.4, history_len=4, horizon=4,
                          max_agents=8)
    assert len(ex) > 0
    for e in ex:
        assert e.agent_mask.sum() == 7     # all present agents retained
        assert e.hist.shape == (8, 4, 6)


def test_build_examples_masks():
    pos = np.zeros((2, 20, 2))
    valid = np.ones((2, 20), bool)
    valid[1, :10] = False   # agent 1 appears at t=10
    ex = D.build_examples(pos, valid, 0.25, history_len=6, horizon=8, stride=3)
    assert len(ex) > 0
    for e in ex:
        assert e.hist.shape == (2, 6, 6)
        assert e.fut_vel.shape == (2, 8, 2)


@pytest.mark.slow
def test_training_reduces_loss():
    batches = _synthetic_batches()
    stacked = D.stack_batches(batches[:6])
    model = JMIDModel(CFG, joint=True)
    tc = TrainConfig()
    params, tx, opt = make_train_state(
        model, jax.tree.map(lambda x: x[0], stacked), tc, 1)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(40):
        key, k = jax.random.split(key)
        params, opt, loss = train_step(model, tx, params, opt,
                                       jax.tree.map(jnp.asarray, stacked), k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # eps-MSE is noisy per step (random t, random noise): compare smoothed
    assert np.mean(losses[-10:]) < np.mean(losses[:5])


@pytest.mark.slow
def test_forecaster_plumbing():
    from sicnav_tpu.diffusion import forecaster as FC
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim as CS

    env_cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=3, max_humans=3, starts_moving=0)
    state = CS.reset_host(env_cfg, case=0)
    fcfg = FC.ForecasterConfig(num_samples=8, num_ret_samples=3)
    fstate = FC.init_state(3, fcfg)
    for _ in range(3):
        fstate = FC.update_state_hists(fstate, state, fcfg)
        state, _, _ = CS.step(state, jnp.zeros(2), env_cfg)
    model = JMIDModel(CFG, joint=True)
    batch = FC._scene_batch_from_hist(fstate, state, fcfg)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, key)
    fc, lw = FC.predict_ret_best(model, params, fstate, state, key, fcfg)
    assert fc.shape == (3, 3, fcfg.horizon + 1, 2)
    assert lw.shape == (3, 3)
    # forecasts start at the current positions
    np.testing.assert_allclose(np.asarray(fc[:, 0, 0]),
                               np.asarray(state.h_pos), atol=1e-5)
    assert np.isfinite(np.asarray(fc)).all()


def test_baseline_forecasts():
    from sicnav_tpu.diffusion import baselines as B
    pos = jnp.array([[0.0, 0.0], [1.0, 0.0]])
    vel = jnp.array([[1.0, 0.0], [-1.0, 0.0]])
    st = B.standing_forecast(pos, 4)
    np.testing.assert_allclose(np.asarray(st[:, -1]), np.asarray(pos))
    cv = B.constant_velocity_forecast(pos, vel, 0.25, 4)
    np.testing.assert_allclose(np.asarray(cv[0, -1]), [1.0, 0.0], atol=1e-6)
    # collision-fixed CV: head-on agents must not overlap at any step
    fixed = B.cv_collision_fixed_forecast(
        pos, vel, jnp.array([0.3, 0.3]), jnp.array([True, True]), 0.25, 6)
    d = np.linalg.norm(np.asarray(fixed[0] - fixed[1]), axis=-1)
    assert (d >= 0.6).all()


def test_metrics_logger(tmp_path):
    from sicnav_tpu.utils.metrics import MetricsLogger
    lg = MetricsLogger(str(tmp_path), "t")
    lg.log(step=1, loss=0.5)
    lg.log(step=2, loss=0.25)
    lg.close()
    import json
    lines = [json.loads(l) for l in open(lg.path)]
    assert lines[1]["loss"] == 0.25


def test_most_likely_metrics():
    rng = np.random.default_rng(0)
    gt = jnp.zeros((2, 8, 2))
    pred = jnp.asarray(rng.normal(0, 0.05, (12, 2, 8, 2)))
    a, f = EV.most_likely_ade_fde(pred, gt)
    assert 0 <= float(a) < 0.5 and 0 <= float(f) < 0.5


@pytest.mark.slow
def test_render_episode(tmp_path):
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim as CS
    from sicnav_tpu.utils.render import render_episode
    cfg = EnvConfig(scenario="circle_crossing", human_policy="linear",
                    human_num=2, max_humans=2, starts_moving=0)
    state = CS.reset_host(cfg, case=0)
    states = [state]
    for _ in range(3):
        state, _, _ = CS.step(state, jnp.zeros(2), cfg)
        states.append(state)
    traj = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    out = render_episode(traj, cfg, str(tmp_path / "ep.gif"))
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0
    # full overlay set (plan + guess + human plans + weighted fans + FOV),
    # world frame and robocentric (overlays must transform with the frame)
    T, H, k, F = 4, 2, 3, 5
    rng = np.random.default_rng(0)
    ov = dict(plans=rng.normal(size=(T, 5, 2)),
              guesses=rng.normal(size=(T, 5, 2)),
              human_plans=rng.normal(size=(T, H, 5, 2)),
              forecasts=rng.normal(size=(T, H, k, F, 2)),
              forecast_weights=rng.normal(size=(T, H, k)))
    out2 = render_episode(traj, cfg, str(tmp_path / "ov.gif"),
                          fov_deg=120.0, **ov)
    assert os.path.getsize(out2) > 0
    out3 = render_episode(traj, cfg, str(tmp_path / "rc.gif"),
                          robocentric=True, **ov)
    assert os.path.getsize(out3) > 0


@pytest.mark.slow
def test_eval_scene_full_metric_set():
    """eval_scene_full returns the reference's full metric sweep with
    finite values and monotone horizon fractions on an easy CV scene."""
    import numpy as np
    from sicnav_tpu.diffusion import data as D
    from sicnav_tpu.diffusion.models import ModelConfig
    from sicnav_tpu.diffusion.mid import JMIDModel, eval_scene_full

    rng = np.random.default_rng(0)
    A, T = 3, 30
    pos = (rng.uniform(-2, 2, (A, 1, 2)) +
           rng.uniform(-1, 1, (A, 1, 2)) * np.arange(T)[None, :, None] * 0.25)
    ex = D.build_examples(pos, np.ones((A, T), bool), 0.25,
                          history_len=6, horizon=8, stride=30)[0]
    model = JMIDModel(ModelConfig(context_dim=32, enc_rnn_dim=16, tf_layer=1),
                      joint=True)
    key = jax.random.PRNGKey(0)
    batch = jax.tree.map(jnp.asarray, ex)
    params = model.init({"params": key, "dropout": key}, batch, key)
    m = eval_scene_full(model, params, batch, key, n_samples=6)
    want = {"ade", "fde", "sade", "sfde", "ml_ade", "ml_fde", "kde_nll",
            "ade_one_fourth", "ade_two_fourth", "ade_three_fourth"}
    assert set(m) == want
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    # truncated-horizon ADE grows with the fraction (untrained model still
    # accumulates displacement error over time)
    assert float(m["ade_one_fourth"]) <= float(m["ade_two_fourth"]) + 1e-6
    assert float(m["ade_two_fourth"]) <= float(m["ade_three_fourth"]) + 1e-6


@pytest.mark.slow
def test_partial_future_masking_no_agent_drop():
    """Agents with partially observed futures stay in the eval with
    per-step masks (the reference's NaN-masked metrics) instead of being
    dropped by fut_mask.all()."""
    import numpy as np
    from sicnav_tpu.diffusion import evaluation as EV

    S, T = 4, 8
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.normal(size=(T, 2)), jnp.float32)
    pred = jnp.broadcast_to(gt[None], (S, T, 2)) + 0.1
    # only the first 3 future steps observed
    mask = jnp.array([True] * 3 + [False] * 5)
    a = EV.ade(pred, gt, mask)
    np.testing.assert_allclose(np.asarray(a), np.sqrt(2) * 0.1, rtol=1e-4)
    f = EV.fde(pred, gt, mask)
    # FDE at the LAST OBSERVED step, not the padded end
    np.testing.assert_allclose(np.asarray(f), np.sqrt(2) * 0.1, rtol=1e-4)

    # scene metrics with per-step masks
    gt2 = jnp.stack([gt, gt])
    pred2 = jnp.stack([pred, pred], axis=1)
    sm = jnp.stack([jnp.ones(T, bool), mask])
    sade, sfde = EV.scene_ade_fde(pred2, gt2, jnp.array([True, True]), sm)
    np.testing.assert_allclose(float(sade), np.sqrt(2) * 0.1, rtol=1e-4)


@pytest.mark.slow
def test_diffnet_variants_loss_and_sample():
    """Every config.diffnet name (reference diffusion.py:67-690) initializes,
    trains one step, and samples with finite outputs."""
    import pytest  # noqa: F401
    from sicnav_tpu.diffusion.models import DIFFNETS

    batches = _synthetic_batches(n_scenes=2)
    b = batches[0]
    key = jax.random.PRNGKey(0)
    for name, (_, is_joint) in DIFFNETS.items():
        cfg = ModelConfig(context_dim=16, enc_rnn_dim=8, tf_layer=1,
                          n_heads=2, history_len=6, horizon=8, diffnet=name)
        model = JMIDModel(cfg, joint=is_joint)
        params = model.init({"params": key, "dropout": key}, b, key)
        loss = model.apply(params, b, key, rngs={"dropout": key})
        assert np.isfinite(float(loss)), name
        out = model.apply(params, b, key, 3, method=JMIDModel.sample)
        assert out.shape == (3, b.hist.shape[0], 8, 2), name
        assert np.isfinite(np.asarray(out)).all(), name


def test_linear_decoder_shape():
    from sicnav_tpu.diffusion.models import LinearDecoder
    dec = LinearDecoder(out_dim=12)
    params = dec.init(jax.random.PRNGKey(0), jnp.ones((4, 32)))
    out = dec.apply(params, jnp.ones((4, 32)))
    assert out.shape == (4, 12)


def test_load_trajectory_file_multiclass(tmp_path):
    """Multi-class raw files (process_data.py:326-343,413-421): class tags
    filter by default, keep_classes=None keeps all with NODE_TYPES codes,
    and the jrdb_bev_hst numeric 5th column is not a class tag."""
    f = tmp_path / "jrdb.csv"
    f.write_text(
        "frame_id,track_id,pos_x,pos_y,node_type\n"
        "10,1,0.0,0.0,PEDESTRIAN\n10,2,1.0,1.0,BICYCLE\n10,3,2.0,2.0,ROBOT\n"
        "20,1,0.1,0.0,PEDESTRIAN\n20,2,1.1,1.0,BICYCLE\n20,3,2.1,2.0,ROBOT\n")
    pos, valid = D.load_trajectory_file(str(f), center=False)
    assert pos.shape[0] == 1          # default keeps pedestrians only
    pos, valid, types = D.load_trajectory_file(
        str(f), center=False, keep_classes=None, return_types=True)
    assert pos.shape[0] == 3
    assert list(types) == [0, 1, 2]   # PEDESTRIAN, BICYCLE, ROBOT
    assert valid.all()
    hst = tmp_path / "hst.csv"
    hst.write_text("10,7,0.0,0.0,1\n20,7,0.5,0.0,0\n")
    pos, valid = D.load_trajectory_file(str(hst), center=False)
    assert pos.shape[0] == 1          # interpolated flag != class filter


@pytest.mark.slow
def test_node_type_class_conditioning():
    """Per-node-type dispatch (VERDICT r3 #4; reference builds one MGCVAE
    per node type, encoders/trajectron.py:318): with num_node_types > 1
    the encoder context depends on the class code (same history, different
    class -> different context) and single-class configs are unchanged
    (no new params; None node_type still works)."""
    import jax
    batches = _synthetic_batches(n_scenes=1)
    b = batches[0]._replace(node_type=np.array([0, 1, 2], np.int32))
    key = jax.random.PRNGKey(0)

    cfg1 = ModelConfig(context_dim=32, enc_rnn_dim=16, tf_layer=1)
    m1 = JMIDModel(cfg1, joint=True)
    p1 = m1.init({"params": key, "dropout": key}, b._replace(node_type=None),
                 key)

    cfg3 = ModelConfig(context_dim=32, enc_rnn_dim=16, tf_layer=1,
                       num_node_types=3)
    m3 = JMIDModel(cfg3, joint=True)
    p3 = m3.init({"params": key, "dropout": key}, b, key)
    extra = (set(p3["params"]["encoder"].keys())
             - set(p1["params"]["encoder"].keys()))
    assert extra == {"class_embed", "edge_class_embed", "class_film"}

    ctx_a = m3.apply(p3, b, method=m3.encode)
    ctx_b = m3.apply(p3, b._replace(
        node_type=np.zeros(3, np.int32)), method=m3.encode)
    # relabeling changes every agent's context: its own class feeds the
    # history encoder and its neighbors' classes feed the edge encoder
    assert np.max(np.abs(np.asarray(ctx_a) - np.asarray(ctx_b))) > 1e-6
    # relabeling ONLY agent 1 changes agent 1 (own class) AND its
    # neighbors (edge class), per-class routing end to end
    ctx_c = m3.apply(p3, b._replace(
        node_type=np.array([0, 2, 2], np.int32)), method=m3.encode)
    assert np.max(np.abs(np.asarray(ctx_c[1]) - np.asarray(ctx_a[1]))) > 1e-6

    # loss + training step run with class codes
    loss = m3.apply(p3, b, key, rngs={"dropout": key})
    assert np.isfinite(float(loss))
