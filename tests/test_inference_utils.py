"""Pure-function tests for inference utilities: masks and autoreg windowing."""

import numpy as np

from polyffusion_tpu.inference import get_autoreg_data, get_mask
from polyffusion_tpu.utils.reprs import nmat_to_prmat2c


def test_mask_below_keeps_melody_and_above():
    # melody at pitch 70 for every step
    nmat = np.array([[t, 70, 1] for t in range(128)], np.int64)
    orig = nmat_to_prmat2c(nmat, 128)[None]
    mask = get_mask(orig, "below")
    assert mask.shape == orig.shape
    # keep (mask=1) everything at/above pitch 70; regenerate below
    assert (mask[0, 0, :, 70:] == 1).all()
    assert (mask[0, 0, :, :70] == 0).all()
    # both channels identical
    np.testing.assert_array_equal(mask[0, 0], mask[0, 1])


def test_mask_below_forward_fills_empty_steps():
    nmat = np.array([[t, 60, 1] for t in range(0, 128, 16)], np.int64)
    orig = nmat_to_prmat2c(nmat, 128)[None]
    mask = get_mask(orig, "below")
    # steps with no notes inherit the previous step's boundary
    assert (mask[0, 0, 5, 60:] == 1).all()
    assert (mask[0, 0, 5, :60] == 0).all()


def test_mask_above_keeps_accompaniment_and_below():
    nmat = np.array([[t, 50, 1] for t in range(128)], np.int64)
    orig = nmat_to_prmat2c(nmat, 128)[None]
    mask = get_mask(orig, "above")
    assert (mask[0, 0, :, : 50 + 1] == 1).all()
    assert (mask[0, 0, :, 51:] == 0).all()


def test_mask_bars():
    orig = np.zeros((2, 2, 128, 128), np.float32)
    mask = get_mask(orig, "bars", bar_list=[0, 3])
    assert (mask[:, :, 0:16] == 0).all()
    assert (mask[:, :, 48:64] == 0).all()
    assert (mask[:, :, 16:48] == 1).all()


def test_mask_remaining_is_the_notes():
    nmat = np.array([[0, 60, 2]], np.int64)
    orig = nmat_to_prmat2c(nmat, 128)[None]
    np.testing.assert_array_equal(get_mask(orig, "remaining"), orig)


def test_autoreg_mid_windows():
    """mid[i] = [second half of seg i | first half of seg i+1] (roll trick)."""
    data = np.arange(3 * 8).reshape(3, 8).astype(float)  # 3 segments of 8 steps
    mid = get_autoreg_data(data, axis=1)
    np.testing.assert_array_equal(mid[0], np.concatenate([data[0, 4:], data[1, :4]]))
    np.testing.assert_array_equal(mid[1], np.concatenate([data[1, 4:], data[2, :4]]))


def test_traced_cfg_scale_matches_static():
    """traced_cfg_scale=True must reproduce the static-scale trajectories for
    s in {0, 1, 5} bit-closely (one executable serves all scales)."""
    import jax

    from polyffusion_tpu.config import Params
    from polyffusion_tpu.inference import InferenceSession
    from polyffusion_tpu.tasks import SDFTask

    cfg = Params(
        model_name="sdf_test", batch_size=2, max_epoch=1, learning_rate=1e-4,
        max_grad_norm=10, bf16=False, in_channels=2, out_channels=2, channels=32,
        attention_levels=[1], n_res_blocks=1, channel_multipliers=[1, 2],
        n_heads=2, tf_layers=1, d_cond=1152, linear_start=0.00085,
        linear_end=0.012, n_steps=8, img_h=32, img_w=32, cond_type="chord",
        cond_mode="mix", use_enc=False,
    )
    task = SDFTask(cfg)
    params = task.init_params(jax.random.PRNGKey(0))
    cond = np.random.default_rng(0).standard_normal((2, 1, 1152)).astype(np.float32)

    for scale in (0.0, 1.0, 5.0):
        a = InferenceSession(task, params, seed=3).predict(cond, uncond_scale=scale)
        b = InferenceSession(task, params, seed=3, traced_cfg_scale=True).predict(
            cond, uncond_scale=scale
        )
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)

    # one executable: the traced session's paint cache has a single entry
    s = InferenceSession(task, params, seed=3, traced_cfg_scale=True)
    s.predict(cond, uncond_scale=0.0)
    s.predict(cond, uncond_scale=5.0)
    assert len(s._paint_cache) == 1


def test_autoreg_piece_batched_equals_sequential():
    """P=4 piece-batched autoreg == 4 sequential P=1 runs, bit for bit
    (VERDICT r3 item 3: the reference generates --num_generate pieces
    serially; across pieces the 2B-1 windows are embarrassingly parallel).

    DDIM eta=0 makes the paint deterministic given the starting noise, so
    passing the SAME explicit noise to both paths isolates the batching."""
    import jax

    from polyffusion_tpu.config import Params
    from polyffusion_tpu.inference import InferenceSession
    from polyffusion_tpu.tasks import SDFTask

    cfg = Params(
        model_name="sdf_test", batch_size=2, max_epoch=1, learning_rate=1e-4,
        max_grad_norm=10, bf16=False, in_channels=2, out_channels=2, channels=32,
        attention_levels=[1], n_res_blocks=1, channel_multipliers=[1, 2],
        n_heads=2, tf_layers=1, d_cond=1152, linear_start=0.00085,
        linear_end=0.012, n_steps=8, img_h=32, img_w=32, cond_type="chord",
        cond_mode="mix", use_enc=False,
    )
    task = SDFTask(cfg)
    params = task.init_params(jax.random.PRNGKey(0))

    P, B = 4, 3
    rng = np.random.default_rng(7)
    conds = rng.standard_normal((P, B, 1, cfg.d_cond)).astype(np.float32)
    cond_mids = rng.standard_normal((P, B - 1, 1, cfg.d_cond)).astype(np.float32)
    noise = rng.standard_normal((P, B, cfg.img_h, cfg.img_w, 2)).astype(np.float32)

    def make_session():
        return InferenceSession(task, params, use_ddim=True, ddim_steps=4, seed=0)

    batched = make_session().predict(
        conds, cond_mids, uncond_scale=5.0, autoreg=True, noise=noise
    )
    assert batched.shape == (P, 2 * B, 2, cfg.img_h // 2, cfg.img_w)

    for p in range(P):
        solo = make_session().predict(
            conds[p], cond_mids[p], uncond_scale=5.0, autoreg=True, noise=noise[p]
        )
        assert solo.shape == (2 * B, 2, cfg.img_h // 2, cfg.img_w)
        np.testing.assert_array_equal(
            batched[p], solo, err_msg=f"piece {p} diverged from its solo run"
        )


def test_autoreg_batched_pieces_differ_without_explicit_noise():
    """Without explicit noise, each batched piece gets its OWN starting noise
    (fold_in per piece) — identical conds must still yield distinct pieces."""
    import jax

    from polyffusion_tpu.config import Params
    from polyffusion_tpu.inference import InferenceSession
    from polyffusion_tpu.tasks import SDFTask

    cfg = Params(
        model_name="sdf_test", batch_size=2, max_epoch=1, learning_rate=1e-4,
        max_grad_norm=10, bf16=False, in_channels=2, out_channels=2, channels=32,
        attention_levels=[], n_res_blocks=1, channel_multipliers=[1, 2],
        n_heads=2, tf_layers=1, d_cond=1152, linear_start=0.00085,
        linear_end=0.012, n_steps=8, img_h=32, img_w=32, cond_type="chord",
        cond_mode="mix", use_enc=False,
    )
    task = SDFTask(cfg)
    params = task.init_params(jax.random.PRNGKey(0))
    session = InferenceSession(task, params, use_ddim=True, ddim_steps=4, seed=0)

    B = 2
    cond = np.random.default_rng(1).standard_normal((1, B, 1, cfg.d_cond)).astype(np.float32)
    conds = np.broadcast_to(cond, (2, B, 1, cfg.d_cond)).copy()
    cond_mids = np.zeros((2, B - 1, 1, cfg.d_cond), np.float32)
    out = session.predict(conds, cond_mids, uncond_scale=0.0, autoreg=True)
    assert not np.array_equal(out[0], out[1])


def test_dp_sharded_paint_bit_exact():
    """dp-batch-sharded DDIM paint == single-device, BIT FOR BIT, under the
    suite's default XLA flags (TODO.md round-4 item 6).  The driver dryrun
    re-asserts the same property at 5e-5 because its compile-speed flags
    (__graft_entry__._provision_virtual_cpu_mesh) move fusion boundaries."""
    import jax

    from polyffusion_tpu.config import Params
    from polyffusion_tpu.inference import InferenceSession
    from polyffusion_tpu.parallel import make_mesh
    from polyffusion_tpu.tasks import SDFTask

    cfg = Params(
        model_name="sdf_test", batch_size=8, max_epoch=1, learning_rate=1e-4,
        max_grad_norm=10, bf16=False, in_channels=2, out_channels=2, channels=32,
        attention_levels=[1], n_res_blocks=1, channel_multipliers=[1, 2],
        n_heads=2, tf_layers=1, d_cond=1152, linear_start=0.00085,
        linear_end=0.012, n_steps=8, img_h=32, img_w=32, cond_type="chord",
        cond_mode="mix", use_enc=False,
    )
    task = SDFTask(cfg)
    params = task.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    b = 8
    cond = rng.standard_normal((b, 1, cfg.d_cond)).astype(np.float32)
    orig = rng.random((b, 2, 32, 32)).astype(np.float32)
    mask = np.zeros_like(orig)
    mask[:, :, :16] = 1.0
    noise = rng.standard_normal((b, 32, 32, 2)).astype(np.float32)

    def run(mesh):
        s = InferenceSession(
            task, params, use_ddim=True, ddim_steps=3, seed=0, mesh=mesh
        )
        return s.predict(cond, uncond_scale=5.0, orig=orig, mask=mask, noise=noise)

    ref = run(None)
    dp = run(make_mesh())
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(dp))
