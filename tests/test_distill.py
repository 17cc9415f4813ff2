"""Progressive distillation (diffusion/progressive.py, tasks/distill.py,
distill.py CLI): v-parameterization algebra, halving-grid conventions pinned
against the real DDIM sampler step, loss wiring, convergence, and the full
teacher -> distill -> v-student inference pipeline.

Beyond-reference feature (Salimans & Ho arXiv:2202.00512; Meng et al.
arXiv:2210.03142): the reference's cheapest guided path is DDIM-50 with a
double-batched CFG call (inference_sdf.py:449-463)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyffusion_tpu.config import Params, load_params
from polyffusion_tpu.diffusion import make_ddim_schedule, make_schedule
from polyffusion_tpu.diffusion import progressive as P

from synth import make_song_npz

SCHED = make_schedule(1000, 0.00085, 0.012)


def _gather(tab, taus):
    return np.asarray(tab)[np.asarray(taus)].reshape(-1, 1, 1, 1).astype(np.float32)


# ---------------------------------------------------------------------------
# pure algebra
# ---------------------------------------------------------------------------


def test_v_eps_roundtrip(rng):
    taus = np.array([3, 250, 600, 998])
    a = _gather(SCHED.sqrt_alpha_bar, taus)
    s = _gather(SCHED.sqrt_1m_alpha_bar, taus)
    x0 = rng.standard_normal((4, 5, 6, 2)).astype(np.float32)
    eps = rng.standard_normal((4, 5, 6, 2)).astype(np.float32)
    x = a * x0 + s * eps
    v = P.v_from_eps_x0(eps, x0, a, s)
    np.testing.assert_allclose(P.eps_from_v(x, v, a, s), eps, atol=1e-5)
    np.testing.assert_allclose(P.x0_from_v(x, v, a, s), x0, atol=1e-5)


def test_v_to_eps_apply_recovers_the_underlying_eps(rng):
    """A v-net whose v encodes a known eps function must, through the adapter,
    reproduce that eps exactly — so every eps-contract sampler runs v models."""

    def eps0(x):
        return jnp.tanh(x) + 0.1

    def fake_v_net(params, x, t, cond, **kw):
        a = _gather(SCHED.sqrt_alpha_bar, t)
        s = _gather(SCHED.sqrt_1m_alpha_bar, t)
        x0 = (x - s * eps0(x)) / a
        return P.v_from_eps_x0(eps0(x), x0, a, s)

    apply_eps = P.make_v_to_eps_apply(fake_v_net, SCHED)
    x = jnp.asarray(rng.standard_normal((3, 8, 8, 2)), jnp.float32)
    t = jnp.asarray([5, 500, 999], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(apply_eps(None, x, t, None)), np.asarray(eps0(x)), atol=1e-5
    )
    # adapter must NOT advertise the CFG fork (students are single-pass)
    assert not getattr(apply_eps, "supports_cfg_fork", False)


def test_halving_grids_chain():
    grids = P.halving_grids(1000, 64, 4)
    assert [len(g) for g in grids] == [64, 32, 16, 8, 4]
    top = grids[0][-1]
    for g in grids:
        assert g[-1] == top  # from-noise start level preserved per phase
        assert (np.diff(g) > 0).all() and g[0] >= 1 and g[-1] < 1000
    for fine, coarse in zip(grids, grids[1:]):
        assert set(coarse) <= set(fine)
        np.testing.assert_array_equal(coarse, fine[1::2])
    with pytest.raises(ValueError):
        P.halving_grids(1000, 48, 4)  # 12 is not a power of two


def test_phase_tables_match_student_ddim_schedule():
    """The phase's (a_t, a_p) columns must equal the alpha/alpha_prev tables the
    DDIM sampler will actually use on the student grid — one convention."""
    fine = P.halving_grids(1000, 16, 8)[0]
    tbl = P.phase_tables(SCHED, fine)
    dd = make_ddim_schedule(SCHED, time_steps=fine[1::2])
    np.testing.assert_array_equal(tbl.tau, dd.time_steps)
    np.testing.assert_allclose(tbl.a_t**2, dd.alpha, atol=1e-6)
    np.testing.assert_allclose(tbl.a_p**2, dd.alpha_prev, atol=1e-6)
    np.testing.assert_allclose(tbl.s_t, dd.sqrt_one_minus_alpha, atol=1e-6)
    np.testing.assert_array_equal(tbl.tau_mid, fine[0::2])
    assert (tbl.weight >= 1.0).all()


def test_pad_tables():
    fine = P.halving_grids(1000, 8, 4)[0]
    tbl = P.phase_tables(SCHED, fine)
    padded, m = P.pad_tables(tbl, 16)
    assert m == 4
    for name in tbl._fields:
        col, pcol = getattr(tbl, name), getattr(padded, name)
        assert pcol.shape == (16,)
        np.testing.assert_array_equal(pcol[:4], col)
        np.testing.assert_array_equal(pcol[4:], np.repeat(col[-1:], 12))


def test_one_student_step_equals_two_teacher_steps(rng):
    """The defining distillation identity, pinned against the REAL sampler step:
    a student predicting exactly ``solve_x0_target`` reproduces, in ONE
    ``_ddim_step`` on the coarse grid, the teacher's TWO ``_ddim_step``s on the
    fine grid — for every student index including the boundary rows."""
    from polyffusion_tpu.diffusion.sampler import _ddim_step, _ddim_tables

    fine = P.halving_grids(1000, 8, 4)[0]
    tbl = P.phase_tables(SCHED, fine)
    dd_f = make_ddim_schedule(SCHED, time_steps=fine)
    dd_s = make_ddim_schedule(SCHED, time_steps=fine[1::2])
    tf, ts_ = _ddim_tables(dd_f), _ddim_tables(dd_s)
    zero = jnp.zeros((2, 4, 4, 1), jnp.float32)

    def teacher_eps(params, x, t, cond, cond_concat=None):
        return jnp.tanh(x) * (1.0 + t.reshape(-1, 1, 1, 1) / 1000.0)

    for j in range(4):
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 1)), jnp.float32)
        x_mid = _ddim_step(tf, teacher_eps, None, x, None,
                           int(fine[2 * j + 1]), 2 * j + 1, zero, None)
        x_prev = _ddim_step(tf, teacher_eps, None, x_mid, None,
                            int(fine[2 * j]), 2 * j, zero, None)
        x0_tgt = P.solve_x0_target(
            np.asarray(x), np.asarray(x_prev), tbl.coef_xt[j], tbl.denom[j]
        )

        def perfect_student(params, xx, t, cond, cond_concat=None):
            return (xx - tbl.a_t[j] * x0_tgt) / tbl.s_t[j]

        x_student = _ddim_step(ts_, perfect_student, None, x, None,
                               int(tbl.tau[j]), j, zero, None)
        np.testing.assert_allclose(
            np.asarray(x_student), np.asarray(x_prev), atol=2e-4
        ), j


# ---------------------------------------------------------------------------
# task loss wiring
# ---------------------------------------------------------------------------

TINY_CFG = Params(
    model_name="sdf_tiny",
    batch_size=4, max_epoch=1, learning_rate=1e-3, max_grad_norm=10,
    bf16=False, in_channels=2, out_channels=2, channels=32,
    attention_levels=[], n_res_blocks=1, channel_multipliers=[1, 2],
    n_heads=2, tf_layers=1, d_cond=1152,
    linear_start=0.00085, linear_end=0.012, n_steps=1000,
    img_h=32, img_w=32, cond_type="chord", cond_mode="cond", use_enc=False,
)


def _tiny_batch(rng, b=4, h=32, w=32):
    x = (rng.random((b, 2, h, w)) < 0.2).astype(np.float32)
    return (
        x,
        np.zeros((b, 128, 20, 6), np.int64),
        (rng.random((b, 32, 36)) < 0.1).astype(np.float32),
        np.zeros((b, 128, 128), np.float32),
    )


def test_guided_loss_matches_manual_recompute(rng):
    """Stage-A loss == a by-hand recompute of teacher CFG eps -> x0 target ->
    student v -> truncated-SNR-weighted x0 MSE, with the same PRNG stream."""
    from polyffusion_tpu.diffusion.sampler import make_eps_fn
    from polyffusion_tpu.tasks.distill import DistillTask
    from polyffusion_tpu.tasks.sdf import SDFTask

    base = SDFTask(TINY_CFG)
    params = base.init_params(jax.random.PRNGKey(0))
    task = DistillTask(base, 3.0, "guided")
    batch = _tiny_batch(rng)
    key = jax.random.PRNGKey(7)
    loss, metrics = task.loss_fn(params, {"teacher": params}, batch, key, {})
    assert np.isfinite(float(loss))

    # manual recompute (same splits as tasks/distill.py loss_fn)
    kt, kn = jax.random.split(key)
    x0 = jnp.asarray(np.transpose(batch[0], (0, 2, 3, 1)))
    cond = jnp.asarray(batch[2].reshape(4, 1, -1))
    t = jax.random.randint(kt, (4,), 0, 1000)
    noise = jax.random.normal(kn, x0.shape, x0.dtype)
    a = jnp.asarray(SCHED.sqrt_alpha_bar)[t].reshape(-1, 1, 1, 1)
    s = jnp.asarray(SCHED.sqrt_1m_alpha_bar)[t].reshape(-1, 1, 1, 1)
    x_t = a * x0 + s * noise
    eps_fn = make_eps_fn(base.apply_eps, 3.0, -jnp.ones_like(cond))
    eps_g = eps_fn(params, x_t, t, cond)
    x0_tgt = (x_t - s * eps_g) / a
    v = base.apply_raw(params, x_t, t, cond)
    w = jnp.maximum(a**2 / s**2, 1.0)
    expect = jnp.mean(w * (P.x0_from_v(x_t, v, a, s) - x0_tgt) ** 2)
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-5)


def test_halve_loss_runs_and_is_finite(rng):
    from polyffusion_tpu.tasks.distill import DistillTask
    from polyffusion_tpu.tasks.sdf import SDFTask

    base = SDFTask(TINY_CFG)
    params = base.init_params(jax.random.PRNGKey(0))
    fine = P.halving_grids(1000, 8, 4)[0]
    tbl, m = P.pad_tables(P.phase_tables(base.schedule, fine), 8)
    for kind in ("eps_guided", "v"):
        task = DistillTask(base, 3.0, "halve", teacher_kind=kind)
        frozen = {"teacher": params, "tables": dict(tbl._asdict()), "m": np.int32(m)}
        loss, _ = jax.jit(task.loss_fn)(
            params, frozen, _tiny_batch(rng), jax.random.PRNGKey(1), {}
        )
        assert np.isfinite(float(loss)), kind


@pytest.mark.slow
def test_halve_distillation_converges(rng):
    """On a fixed batch the student must learn the two-step jump: loss drops
    by >5x within a few dozen steps (the loss is exactly representable — the
    student net sees the same inputs the targets were built from)."""
    from polyffusion_tpu.tasks.distill import DistillTask
    from polyffusion_tpu.tasks.sdf import SDFTask
    from polyffusion_tpu.train import create_state, make_optimizer, make_train_step

    base = SDFTask(TINY_CFG)
    teacher = base.init_params(jax.random.PRNGKey(0))
    fine = P.halving_grids(1000, 8, 4)[0]
    tbl, m = P.pad_tables(P.phase_tables(base.schedule, fine), 4)
    task = DistillTask(base, 1.5, "halve", teacher_kind="eps_guided")
    frozen = {"teacher": teacher, "tables": dict(tbl._asdict()), "m": np.int32(m)}
    optimizer = make_optimizer(1e-3)
    step = make_train_step(task, optimizer)
    # host copy: the state is donated every step and must not alias the frozen
    # teacher buffers (the Trainer path copies via fit(init_params=...))
    state = create_state(jax.tree_util.tree_map(np.array, teacher), optimizer)
    batch = _tiny_batch(rng)
    losses = []
    for _ in range(60):
        state, metrics = step(state, batch, jax.random.PRNGKey(2), (), frozen)
        losses.append(float(metrics["loss"]))
    assert min(losses[-5:]) < np.mean(losses[:3]) / 5, losses[:3] + losses[-5:]


def _ddim_walk(eps_fn, params, grid, x, cond, schedule):
    """Deterministic DDIM(eta=0) walk down an ascending tau ``grid`` starting
    from ``x`` at the grid's top level; the bottom step lands on alpha_bar[0]
    (the ``halving_grids`` prev convention, pinned against the real sampler in
    test_phase_tables_match_student_ddim_schedule)."""
    ab = schedule.alpha_bar.astype(np.float64)
    g = np.asarray(grid)
    for i in range(len(g) - 1, -1, -1):
        a_f, s_f = np.sqrt(ab[g[i]]), np.sqrt(1.0 - ab[g[i]])
        ab_to = ab[g[i - 1]] if i > 0 else ab[0]
        a_to, s_to = np.sqrt(ab_to), np.sqrt(1.0 - ab_to)
        t = jnp.full((x.shape[0],), int(g[i]), jnp.int32)
        eps = eps_fn(params, x, t, cond)
        x = P.ddim_jump(x, eps, np.float32(a_f), np.float32(s_f),
                        np.float32(a_to), np.float32(s_to))
    return np.asarray(x)


@pytest.mark.slow
def test_student_endpoint_beats_naive_ddim(rng):
    """Sample-space distillation win (PARITY.md "Progressive distillation"):
    under SHARED start noise and held-out conditions, the trained 4-step
    student's DDIM endpoint lands closer to the teacher's fine-grid 8-step
    endpoint than the naive teacher-at-4-steps endpoint does.

    This is the metric the chd_acc fidelity sweep cannot provide: chord
    identity saturates w.r.t. NFE count (the round-5 fidelity table shows
    naive DDIM-4 matching DDIM-50 on chd_acc), while endpoint distance to the
    fine-grid trajectory directly measures the integration error distillation
    exists to remove."""
    from polyffusion_tpu.diffusion.progressive import make_v_to_eps_apply
    from polyffusion_tpu.diffusion.sampler import make_eps_fn
    from polyffusion_tpu.tasks.distill import DistillTask
    from polyffusion_tpu.tasks.sdf import SDFTask
    from polyffusion_tpu.train import create_state, make_optimizer, make_train_step

    base = SDFTask(TINY_CFG)
    teacher = base.init_params(jax.random.PRNGKey(0))
    fine, coarse = P.halving_grids(1000, 8, 4)
    tbl, m = P.pad_tables(P.phase_tables(base.schedule, fine), 4)
    task = DistillTask(base, 1.5, "halve", teacher_kind="eps_guided")
    frozen = {"teacher": teacher, "tables": dict(tbl._asdict()), "m": np.int32(m)}
    optimizer = make_optimizer(1e-3)
    step = make_train_step(task, optimizer)
    state = create_state(jax.tree_util.tree_map(np.array, teacher), optimizer)
    key = jax.random.PRNGKey(7)
    for i in range(300):  # fresh batch + rng every step: must generalize
        state, _ = step(state, _tiny_batch(rng), jax.random.fold_in(key, i),
                        (), frozen)
    student = jax.device_get(state.params)

    # held-out conditions + shared start noise at the (shared) top tau
    eval_batch = _tiny_batch(rng)
    cond = base.encode_cond(eval_batch, None)
    x_start = rng.standard_normal((4, 32, 32, 2)).astype(np.float32)
    teacher_eps = make_eps_fn(base.apply_eps, 1.5, -jnp.ones_like(cond))
    student_eps = make_v_to_eps_apply(base.apply_raw, base.schedule)

    end_fine = _ddim_walk(teacher_eps, teacher, fine, x_start, cond, base.schedule)
    end_naive = _ddim_walk(teacher_eps, teacher, coarse, x_start, cond, base.schedule)
    end_student = _ddim_walk(student_eps, student, coarse, x_start, cond,
                             base.schedule)

    mse_naive = float(np.mean((end_naive - end_fine) ** 2))
    mse_student = float(np.mean((end_student - end_fine) ** 2))
    assert mse_student < 0.55 * mse_naive, (mse_student, mse_naive)


# ---------------------------------------------------------------------------
# full pipeline: teacher run -> distill CLI -> v-student inference
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("distill_npz")
    for i in range(3):
        make_song_npz(str(d / f"{i}.npz"), n_bars=16, seed=i)
    return str(d)


@pytest.mark.slow
def test_distill_cli_e2e(data_dir, tmp_path):
    from polyffusion_tpu import distill as distill_cli
    from polyffusion_tpu.data import SegmentDataset, make_loaders
    from polyffusion_tpu.inference import InferenceSession, load_unet_params
    from polyffusion_tpu.parallel import make_mesh
    from polyffusion_tpu.tasks.sdf import SDFTask
    from polyffusion_tpu.train import Trainer

    cfg = Params({**TINY_CFG, "img_h": 128, "img_w": 128, "batch_size": 8,
                  "cond_mode": "mix"})
    teacher_dir = str(tmp_path / "teacher")
    mesh = make_mesh()
    train_ds, val_ds = SegmentDataset.train_val_from_dir(data_dir, 0.75)
    train_dl, val_dl = make_loaders(train_ds, val_ds, 8, mesh)
    task = SDFTask(cfg)
    Trainer(task, cfg, teacher_dir, mesh=mesh, max_steps=2, log_every=1).fit(
        train_dl, val_dl, resume=False
    )

    out = str(tmp_path / "student")
    distill_cli.main([
        "--teacher", teacher_dir, "--data_dir", data_dir, "--output_dir", out,
        "--guide_scale", "3.0", "--base_steps", "8", "--end_steps", "4",
        "--stage_a_steps", "2", "--phase_steps", "2", "--batch_size", "8",
        "--save_every", "1", "--log_every", "1",
    ])

    final_cfg = load_params(os.path.join(out, "params.yaml"))
    assert final_cfg["v_prediction"] is True
    assert final_cfg["distilled_scale"] == 3.0
    grid = final_cfg["distill_grid"]
    assert len(grid) == 4 and grid == sorted(grid)
    assert os.path.isdir(os.path.join(out, "chkpts"))  # phase symlink resolves

    # the normal inference path consumes the distilled run dir unchanged;
    # ddim_steps=None (every CLI's default) auto-pins the student's own grid
    task2 = SDFTask(final_cfg)
    assert task2.v_prediction
    params2 = load_unet_params(out, task2)
    session = InferenceSession(task2, params2, use_ddim=True, seed=0)
    np.testing.assert_array_equal(np.asarray(session.ddim.time_steps), grid)
    cond = -np.ones((2, 1, cfg.d_cond), np.float32)
    gen = session.predict(cond, uncond_scale=1.0)  # single-pass: guidance baked in
    assert gen.shape == (2, 2, 128, 128)
    assert np.isfinite(gen).all()

    # off-grid sampling of a stage-B student is allowed but warned (stage-A
    # students are grid-free); the session falls back to a uniform grid
    session50 = InferenceSession(task2, params2, use_ddim=True, ddim_steps=8, seed=0)
    assert session50.ddim.n_steps == 8

    # --- chain mode: the distilled run dir is itself the teacher ------------
    # continue halving 4 -> 2 -> 1 from the student's OWN stored grid (nested
    # G[1::2] subsampling — NOT a freshly computed coarse grid)
    out1 = str(tmp_path / "student_1step")
    distill_cli.main([
        "--teacher", out, "--data_dir", data_dir, "--output_dir", out1,
        "--end_steps", "1", "--phase_steps", "2", "--batch_size", "8",
        "--save_every", "1", "--log_every", "1",
    ])
    cfg1 = load_params(os.path.join(out1, "params.yaml"))
    assert cfg1["v_prediction"] is True
    assert cfg1["distilled_scale"] == 3.0  # inherited, not the CLI default 5.0
    g = list(grid)
    assert cfg1["distill_grid"] == g[1::2][1::2]  # nested halving of the stored grid
    assert not os.path.isdir(os.path.join(out1, "stage_a"))  # no stage A re-run
    task1 = SDFTask(cfg1)
    params1 = load_unet_params(out1, task1)
    session1 = InferenceSession(task1, params1, use_ddim=True, seed=0)
    assert session1.ddim.n_steps == 1  # single-eval generation
    gen1 = session1.predict(cond, uncond_scale=1.0)
    assert gen1.shape == (2, 2, 128, 128) and np.isfinite(np.asarray(gen1)).all()

    # a teacher grid already at end_steps trains nothing
    with pytest.raises(SystemExit):
        distill_cli.main([
            "--teacher", out1, "--data_dir", data_dir,
            "--output_dir", str(tmp_path / "noop"), "--end_steps", "1",
        ])


@pytest.mark.slow
def test_distill_cli_stage_a_only(data_dir, tmp_path):
    """--base_steps == --end_steps: pure guided distillation — the run dir's
    chkpts symlink must resolve (to stage_a) and the student is grid-free
    (no distill_grid key; samples on any uniform grid)."""
    from polyffusion_tpu import distill as distill_cli
    from polyffusion_tpu.data import SegmentDataset, make_loaders
    from polyffusion_tpu.inference import InferenceSession, load_unet_params
    from polyffusion_tpu.parallel import make_mesh
    from polyffusion_tpu.tasks.sdf import SDFTask
    from polyffusion_tpu.train import Trainer

    cfg = Params({**TINY_CFG, "img_h": 128, "img_w": 128, "batch_size": 8,
                  "cond_mode": "mix"})
    teacher_dir = str(tmp_path / "teacher")
    mesh = make_mesh()
    train_ds, val_ds = SegmentDataset.train_val_from_dir(data_dir, 0.75)
    train_dl, val_dl = make_loaders(train_ds, val_ds, 8, mesh)
    Trainer(SDFTask(cfg), cfg, teacher_dir, mesh=mesh, max_steps=2,
            log_every=1).fit(train_dl, val_dl, resume=False)

    out = str(tmp_path / "student_a")
    distill_cli.main([
        "--teacher", teacher_dir, "--data_dir", data_dir, "--output_dir", out,
        "--guide_scale", "2.0", "--base_steps", "8", "--end_steps", "8",
        "--stage_a_steps", "2", "--batch_size", "8",
        "--save_every", "1", "--log_every", "1",
    ])
    final_cfg = load_params(os.path.join(out, "params.yaml"))
    assert final_cfg["v_prediction"] is True
    assert "distill_grid" not in final_cfg
    assert os.path.isdir(os.path.join(out, "chkpts"))  # -> stage_a/chkpts
    task2 = SDFTask(final_cfg)
    params2 = load_unet_params(out, task2)
    # any grid works: stage-A students are grid-free.  Use S=8 (divides
    # T=1000's quirk-faithful uniform grid evenly); a non-divisor S like 6
    # yields S+1 taus by design (reference sampler_ddim.py:66 arange size
    # quirk, reproduced in diffusion/schedule.py).
    session = InferenceSession(task2, params2, use_ddim=True, ddim_steps=8, seed=0)
    assert session.ddim.n_steps == 8

    # trains-nothing guard
    with pytest.raises(SystemExit):
        distill_cli.main([
            "--teacher", teacher_dir, "--data_dir", data_dir,
            "--output_dir", str(tmp_path / "nothing"),
            "--base_steps", "8", "--end_steps", "8", "--skip_stage_a",
        ])
