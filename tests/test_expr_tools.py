"""Smoke tests: expr eval harness, maintenance tools, image dumps, musicalion variant."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax

from polyffusion_tpu import expr as X
from polyffusion_tpu.config import Params
from polyffusion_tpu.inference import InferenceSession
from polyffusion_tpu.parallel.mesh import init_on_cpu
from polyffusion_tpu.tasks import SDFTask

from synth import make_song_npz

TINY_CFG = Params(
    model_name="sdf_tiny",
    batch_size=4,
    learning_rate=1e-4,
    bf16=False,
    in_channels=2,
    out_channels=2,
    channels=32,
    attention_levels=[2],
    n_res_blocks=1,
    channel_multipliers=[1, 2, 4],
    n_heads=2,
    tf_layers=1,
    d_cond=1152,
    linear_start=0.00085,
    linear_end=0.012,
    n_steps=20,
    img_h=128,
    img_w=128,
    cond_type="chord",
    cond_mode="mix",
    use_enc=False,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npz")
    for i in range(3):
        make_song_npz(str(d / f"{i}.npz"), n_bars=16, seed=i)
    return str(d)


@pytest.fixture(scope="module")
def session_task():
    task = SDFTask(TINY_CFG)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    session = InferenceSession(task, params, use_ddim=True, ddim_steps=2)
    return session, task


@pytest.mark.parametrize("kind", ["uncond", "inp_below", "inp_bars", "chd", "txt"])
def test_experiments_run(session_task, data_dir, tmp_path, kind):
    session, task = session_task
    if kind == "txt":
        # vanilla texture conditioning needs d_cond=128 (the raw prmat rows,
        # cf. sdf_txtvnl.yaml)
        cfg = Params({**TINY_CFG, "d_cond": 128, "cond_type": "txt"})
        task = SDFTask(cfg)
        params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
        session = InferenceSession(task, params, use_ddim=True, ddim_steps=2)
    args = SimpleNamespace(
        data_dir=data_dir,
        split_file=None,
        batch_size=4,
        batch_num=1,
        output_dir=str(tmp_path),
        uncond_scale=1.0,
    )
    gen = X.EXPERIMENTS[kind](session, task, args)
    assert np.isfinite(gen).all()
    import os

    assert any(f.endswith(".mid") for f in os.listdir(tmp_path))


def test_txt_acc_metrics_validity():
    """Metric oracles for expr --type txt_acc: self-comparison is perfect,
    disjoint rhythms score 0, metrics discriminate shifted rhythms."""
    roll = np.zeros((2, 128, 128), np.float32)
    roll[0, ::8, 60] = 1.0  # onsets every half bar
    roll[0, ::8, 64] = 1.0
    assert X.onset_step_f1(roll, roll) == 1.0
    assert X.density_corr(roll, roll) == pytest.approx(1.0)

    shifted = np.zeros_like(roll)
    shifted[0, 4::8, 60] = 1.0  # same density, offset steps: disjoint skeleton
    assert X.onset_step_f1(roll, shifted) == 0.0

    empty = np.zeros_like(roll)
    assert X.onset_step_f1(empty, empty) == 1.0  # both silent: agree
    assert X.onset_step_f1(roll, empty) == 0.0
    assert X.density_corr(roll, empty) == 0.0  # undefined -> 0

    # denser-at-the-same-steps still correlates but a permuted profile doesn't
    denser = roll.copy()
    denser[0, ::8, 67] = 1.0
    assert X.density_corr(roll, denser) == pytest.approx(1.0)

    # saturation regression (round-4 finding): an onset-DENSE generation (a
    # melody moving in 16ths puts an onset at every step) must not make the
    # skeleton F1 a function of the source alone — the register bands keep
    # pairing sensitivity.  Two sources: comping on beats vs off-beats.
    dense = np.zeros_like(roll)
    dense[0, :, 80] = 1.0  # high-register 16th-note melody: every step active
    src_on = np.zeros_like(roll)
    src_on[0, ::4, 40] = 1.0  # bass hits on beats
    src_off = np.zeros_like(roll)
    src_off[0, 2::4, 40] = 1.0  # bass hits off beats
    dense_on = dense + src_on  # generation that copied src_on's bass rhythm
    assert X.onset_step_f1(dense_on, src_on) > X.onset_step_f1(dense_on, src_off)


def test_txt_acc_experiment_runs(data_dir, tmp_path):
    """txt_acc sweeps scales against a frozen random texture encoder and emits
    the metric table with shuffled-pair chance-floor columns."""
    from polyffusion_tpu.models.encoders import TextureEncoder

    enc = TextureEncoder(emb_size=64, hidden_dim=128, z_dim=32, num_channel=10)
    enc_params = enc.init(jax.random.PRNGKey(7), np.zeros((1, 32, 128), np.float32))[
        "params"
    ]
    cfg = Params({**TINY_CFG, "d_cond": 128, "cond_type": "txt", "use_enc": True})
    task = SDFTask(cfg, txt_enc=enc, txt_enc_params=enc_params)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    session = InferenceSession(
        task, params, use_ddim=True, ddim_steps=2, traced_cfg_scale=True
    )
    args = SimpleNamespace(
        data_dir=data_dir, split_file=None, batch_size=2, batch_num=1,
        output_dir=str(tmp_path), uncond_scale=1.0, scales="0,3", seed=0,
    )
    table = X.EXPERIMENTS["txt_acc"](session, task, args)
    assert set(table) == {0.0, 3.0}
    cols = {"onset_f1", "onset_f1_shuf", "dens_corr", "dens_corr_shuf",
            "txt_cos", "txt_cos_shuf"}
    for row in table.values():
        assert set(row) == cols
        assert all(np.isfinite(v) for v in row.values())
        assert 0.0 <= row["onset_f1"] <= 1.0
    assert len(session._paint_cache) == 1  # one executable for the whole sweep
    import os

    assert os.path.exists(os.path.join(tmp_path, "txt_acc.json"))


def test_pnt_acc_metric_validity():
    """Metric oracle for expr --type pnt_acc: exact note-cell F1 is perfect on
    self, 0 on pitch-disjoint rolls, and — unlike the banded rhythm F1 — stays
    pairing-sensitive even when BOTH rolls are onset-dense at every step
    (the saturation mode that motivated it; VERDICT r4 item 6)."""
    roll = np.zeros((2, 128, 128), np.float32)
    roll[0, ::4, 60] = 1.0
    assert X.note_cell_f1(roll, roll) == 1.0
    other = np.zeros_like(roll)
    other[0, ::4, 64] = 1.0  # same rhythm + register band, different pitch:
    assert X.note_cell_f1(roll, other) == 0.0  # exact cells disjoint...
    assert X.onset_step_f1(roll, other) == 1.0  # ...banded metric can't see it
    empty = np.zeros_like(roll)
    assert X.note_cell_f1(empty, empty) == 1.0
    assert X.note_cell_f1(roll, empty) == 0.0

    # dense-generation saturation: every step active in every band, but the
    # pitch content still separates the matched source from a shuffled one
    dense_a = np.zeros_like(roll)
    dense_a[0, :, 30] = dense_a[0, :, 60] = dense_a[0, :, 90] = 1.0
    dense_b = np.zeros_like(roll)
    dense_b[0, :, 35] = dense_b[0, :, 65] = dense_b[0, :, 95] = 1.0
    assert X.onset_step_f1(dense_a, dense_b) == 1.0  # banded F1 saturates
    assert X.note_cell_f1(dense_a, dense_b) == 0.0  # exact cells do not


def test_pnt_acc_experiment_runs(data_dir, tmp_path):
    """pnt_acc sweeps scales against a frozen random pnotree encoder and emits
    the metric table with shuffled-pair chance-floor columns (VERDICT r4
    item 6: the 4th cond_type gets a quantitative control metric)."""
    from polyffusion_tpu.models.encoders import PianoTreeEncoder

    enc = PianoTreeEncoder(
        note_emb_size=16, enc_notes_hid_size=16, enc_time_hid_size=32, z_size=32
    )
    pn0 = np.full((1, 32, 20, 6), enc.pitch_pad, np.int32)
    enc_params = enc.init(jax.random.PRNGKey(5), pn0)["params"]
    cfg = Params({**TINY_CFG, "d_cond": 4 * 32, "cond_type": "pnotree",
                  "use_enc": True})
    task = SDFTask(cfg, pnotree_enc=enc, pnotree_enc_params=enc_params)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    session = InferenceSession(
        task, params, use_ddim=True, ddim_steps=2, traced_cfg_scale=True
    )
    args = SimpleNamespace(
        data_dir=data_dir, split_file=None, batch_size=2, batch_num=1,
        output_dir=str(tmp_path), uncond_scale=1.0, scales="0,3", seed=0,
    )
    table = X.EXPERIMENTS["pnt_acc"](session, task, args)
    assert set(table) == {0.0, 3.0}
    cols = {"note_f1", "note_f1_shuf", "onset_f1", "onset_f1_shuf"}
    for row in table.values():
        assert set(row) == cols
        assert all(np.isfinite(v) for v in row.values())
        assert all(0.0 <= row[c] <= 1.0 for c in cols)
    assert len(session._paint_cache) == 1  # one executable for the whole sweep
    import os

    assert os.path.exists(os.path.join(tmp_path, "pnt_acc.json"))


def test_frechet_distance_closed_form():
    """frechet_distance matches the analytic 2-Wasserstein distance for
    diagonal Gaussians, is zero on identical inputs, and is invariant under a
    shared orthogonal rotation of the feature space."""
    rng = np.random.default_rng(0)
    mu1, mu2 = rng.normal(size=6), rng.normal(size=6)
    d1, d2 = rng.uniform(0.5, 2.0, 6), rng.uniform(0.5, 2.0, 6)
    # diagonal case: |mu1-mu2|^2 + sum (sqrt(d1) - sqrt(d2))^2
    expect = ((mu1 - mu2) ** 2).sum() + ((np.sqrt(d1) - np.sqrt(d2)) ** 2).sum()
    got = X.frechet_distance(mu1, np.diag(d1), mu2, np.diag(d2))
    assert got == pytest.approx(expect, rel=1e-9)

    a = rng.normal(size=(5, 5))
    cov = a @ a.T + np.eye(5)
    assert X.frechet_distance(mu1[:5], cov, mu1[:5], cov) == pytest.approx(0.0, abs=1e-9)

    # rotation invariance (general non-commuting covariances)
    b = rng.normal(size=(5, 5))
    cov2 = b @ b.T + np.eye(5)
    q, _ = np.linalg.qr(rng.normal(size=(5, 5)))
    base = X.frechet_distance(mu1[:5], cov, mu2[:5], cov2)
    rot = X.frechet_distance(q @ mu1[:5], q @ cov @ q.T, q @ mu2[:5], q @ cov2 @ q.T)
    assert rot == pytest.approx(base, rel=1e-8)

    # estimator sanity: two large samples of the same Gaussian ~ 0, a
    # mean-shifted one ~ shift^2
    x = rng.normal(size=(4000, 4))
    y = rng.normal(size=(4000, 4))
    near = X.frechet_distance(*X._gaussian_stats(x), *X._gaussian_stats(y))
    far = X.frechet_distance(*X._gaussian_stats(x), *X._gaussian_stats(y + 3.0))
    assert near < 0.1
    assert far == pytest.approx(9.0 * 4, rel=0.1)


def test_feature_stats_discriminates():
    """feature_stats: correct shape, finite, and separates distributions that
    differ in pitch placement or rhythm periodicity (what FD is measuring)."""
    def corpus(base_pitch, period, n=192, seed=0):
        # octave + semitone jitter per note: real within-corpus variance, so
        # the same-distribution FD floor is tiny (measured 6e-5) while the
        # pitch-class shift (0.73) and rhythm-period shift (17.3) stand out
        rng = np.random.default_rng(seed)
        out = np.zeros((n, 2, 128, 128), np.float32)
        for i in range(n):
            for s in range(0, 128, period):
                p = base_pitch + 12 * rng.integers(-1, 2) + rng.integers(0, 3)
                out[i, 0, s, p] = 1.0
                out[i, 1, s : s + period, p] = 1.0
        return out

    f = X.feature_stats(corpus(60, 4))
    assert f.shape == (192, 25) and np.isfinite(f).all()

    ref = X._gaussian_stats(f)
    fd_same = X.frechet_distance(
        *X._gaussian_stats(X.feature_stats(corpus(60, 4, seed=1))), *ref
    )
    fd_pitch = X.frechet_distance(
        *X._gaussian_stats(X.feature_stats(corpus(67, 4, seed=1))), *ref
    )
    fd_rhythm = X.frechet_distance(
        *X._gaussian_stats(X.feature_stats(corpus(60, 8, seed=1))), *ref
    )
    assert fd_pitch > 100 * max(fd_same, 1e-6), (fd_pitch, fd_same)
    assert fd_rhythm > 100 * max(fd_same, 1e-6), (fd_rhythm, fd_same)

    # the empty roll is finite (guarded divisions), not NaN
    assert np.isfinite(X.feature_stats(np.zeros((2, 2, 128, 128)))).all()


def test_precision_recall_oracles():
    """precision_recall discriminates the two failure modes FD conflates:
    mode dropping (recall falls, precision holds) vs off-manifold junk
    (precision falls, recall holds); identical sets score ~1/1 and a far
    offset scores 0/0."""
    rng = np.random.default_rng(0)
    # two well-separated modes in 4-d
    mode_a = rng.normal(size=(100, 4)) * 0.3
    mode_b = rng.normal(size=(100, 4)) * 0.3 + 8.0
    real = np.concatenate([mode_a, mode_b])

    # identical sets: both ~1 (every sample is inside its own twin's manifold)
    p, r = X.precision_recall(real, real.copy())
    assert p == 1.0 and r == 1.0

    # same distribution, fresh draw: both high
    gen_same = np.concatenate(
        [rng.normal(size=(100, 4)) * 0.3, rng.normal(size=(100, 4)) * 0.3 + 8.0]
    )
    p, r = X.precision_recall(real, gen_same)
    assert p > 0.85 and r > 0.85, (p, r)

    # MODE DROPPING: generator only ever produces mode A -> precision stays
    # high (every sample is realistic), recall collapses to ~the dropped share
    gen_drop = rng.normal(size=(200, 4)) * 0.3
    p, r = X.precision_recall(real, gen_drop)
    assert p > 0.85, p
    assert 0.3 < r < 0.7, r

    # OFF-MANIFOLD JUNK: half the samples land far from any real data ->
    # precision ~halves, recall stays high (real modes still covered)
    junk = rng.normal(size=(100, 4)) * 0.3 - 30.0
    gen_junk = np.concatenate([gen_same[:50], gen_same[100:150], junk])
    p, r = X.precision_recall(real, gen_junk)
    assert 0.3 < p < 0.7, p
    assert r > 0.85, r

    # far offset: nothing overlaps
    p, r = X.precision_recall(real, real + 100.0)
    assert p == 0.0 and r == 0.0

    # scale robustness: one dimension living on a 1000x scale must not
    # dominate (the real-set standardization) — same oracles hold
    real_s = real * np.array([1000.0, 1.0, 1.0, 1.0])
    drop_s = gen_drop * np.array([1000.0, 1.0, 1.0, 1.0])
    p, r = X.precision_recall(real_s, drop_s)
    assert p > 0.85 and 0.3 < r < 0.7, (p, r)


def test_fd_experiment_runs(session_task, data_dir, tmp_path):
    """fd sweep on a chord-conditioned checkpoint: stats space only, one
    traced-scale executable, noise-floor row present."""
    task = session_task[1]
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    session = InferenceSession(
        task, params, use_ddim=True, ddim_steps=2, traced_cfg_scale=True
    )
    args = SimpleNamespace(
        data_dir=data_dir, split_file=None, batch_size=4, batch_num=1,
        output_dir=str(tmp_path), uncond_scale=1.0, scales="0,3", seed=0,
    )
    table = X.EXPERIMENTS["fd"](session, task, args)
    assert set(table) == {"real_split", 0.0, 3.0}
    for row in table.values():
        assert set(row) == {"fd_stats", "prec_stats", "rec_stats"}
        assert all(np.isfinite(v) and v >= 0 for v in row.values())
        assert row["prec_stats"] <= 1.0 and row["rec_stats"] <= 1.0
    assert len(session._paint_cache) == 1
    import os

    assert os.path.exists(os.path.join(tmp_path, "fd.json"))


def test_fd_experiment_emb_space(data_dir, tmp_path):
    """On a txt-conditioned checkpoint the fd sweep additionally reports the
    texture-encoder embedding space (the FID recipe)."""
    from polyffusion_tpu.models.encoders import TextureEncoder

    enc = TextureEncoder(emb_size=64, hidden_dim=128, z_dim=32, num_channel=10)
    enc_params = enc.init(jax.random.PRNGKey(7), np.zeros((1, 32, 128), np.float32))[
        "params"
    ]
    cfg = Params({**TINY_CFG, "d_cond": 128, "cond_type": "txt", "use_enc": True})
    task = SDFTask(cfg, txt_enc=enc, txt_enc_params=enc_params)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    session = InferenceSession(
        task, params, use_ddim=True, ddim_steps=2, traced_cfg_scale=True
    )
    args = SimpleNamespace(
        data_dir=data_dir, split_file=None, batch_size=4, batch_num=1,
        output_dir=str(tmp_path), uncond_scale=1.0, scales="1", seed=0,
    )
    table = X.EXPERIMENTS["fd"](session, task, args)
    for row in table.values():
        assert set(row) == {
            "fd_stats", "prec_stats", "rec_stats",
            "fd_emb", "prec_emb", "rec_emb",
        }
        assert all(np.isfinite(v) and v >= 0 for v in row.values())


def test_convert_init_txt_enc(tmp_path):
    """--init writes a loadable, deterministic random texture encoder that
    build_frozen_encoders accepts as polydis.npz."""
    from polyffusion_tpu.convert.__main__ import load_params_npz, main as convert_main

    out = str(tmp_path / "polydis.npz")
    convert_main(["--kind", "txt_enc", "--init", "--seed", "3", "--output", out])
    tree = load_params_npz(out)
    assert "rhy_encoder" in tree and "cnn" in tree["rhy_encoder"]

    out2 = str(tmp_path / "polydis2.npz")
    convert_main(["--kind", "txt_enc", "--init", "--seed", "3", "--output", out2])
    t1, t2 = load_params_npz(out), load_params_npz(out2)
    np.testing.assert_array_equal(
        t1["rhy_encoder"]["cnn"]["kernel"], t2["rhy_encoder"]["cnn"]["kernel"]
    )

    from polyffusion_tpu.models.encoders import build_frozen_encoders

    cfg = Params({**TINY_CFG, "cond_type": "txt", "use_enc": True, "d_cond": 1024})
    kw = build_frozen_encoders(cfg, str(tmp_path))
    assert "txt_enc" in kw and "txt_enc_params" in kw
    mu, std = kw["txt_enc"].apply(
        {"params": kw["txt_enc_params"]}, np.zeros((2, 32, 128), np.float32)
    )
    assert mu.shape == (2, 256) and np.isfinite(np.asarray(mu)).all()


def test_show_image(tmp_path):
    from polyffusion_tpu.utils.image import show_image

    img = np.zeros((2, 2, 32, 128), np.float32)
    img[:, 0, ::4, 60] = 1.0
    out = str(tmp_path / "roll.png")
    show_image(img, out)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_tools_split_surgery(tmp_path):
    import pickle

    from polyffusion_tpu.tools import remove_from_split

    split = [["a.npz", "b.npz"], ["c.npz"]]
    path = str(tmp_path / "split.pickle")
    with open(path, "wb") as f:
        pickle.dump(split, f)
    remove_from_split(path, "b.npz")
    with open(path, "rb") as f:
        out = pickle.load(f)
    assert out[0] == ["a.npz"]


def test_tools_cleanup(tmp_path):
    import os

    from polyffusion_tpu.tools import cleanup_checkpoints

    good = tmp_path / "sdf" / "run1" / "chkpts" / "4"
    good.mkdir(parents=True)
    bad = tmp_path / "sdf" / "run2"
    bad.mkdir(parents=True)
    removed = cleanup_checkpoints(str(tmp_path), assume_yes=True)
    assert str(bad) in removed
    assert os.path.isdir(str(good))


def test_pop909_import_and_dict_start_tables(tmp_path):
    """The reference POP909 conversion writes dict start-tables; our loader must
    consume those npz files directly."""
    from polyffusion_tpu.tools import pop909_import
    from polyffusion_tpu.data import SegmentDataset

    rng = np.random.default_rng(0)
    origin = tmp_path / "origin"
    origin.mkdir()
    n_beats = 64
    beat = np.zeros((n_beats, 6), np.int64)
    beat[:, 3] = np.arange(n_beats) % 4  # in-bar position; 0 = downbeat

    def track(n):
        rows = []
        for _ in range(n):
            ob = rng.integers(0, n_beats - 2)
            rows.append([ob, rng.integers(0, 4), 4, ob + 1, rng.integers(0, 4), 4,
                         rng.integers(40, 90), 80])
        return np.array(sorted(rows, key=lambda r: (r[0], r[1])))

    chord = np.zeros((n_beats, 14), np.int64)
    np.savez(
        str(origin / "001.npz"),
        melody=track(30), bridge=track(20), piano=track(50),
        beat=beat, chord=chord,
    )
    out = tmp_path / "npz"
    assert pop909_import(str(origin), str(out)) == 1
    ds = SegmentDataset.from_dir(str(out))
    assert len(ds) > 0
    p2c, pt, chd, pr = ds[0]
    assert p2c.shape == (2, 128, 128)
    assert p2c.sum() > 0


def test_musicalion_chordless_npz(tmp_path):
    """Songs without a chord key load with zero chords (musicalion variant)."""
    from polyffusion_tpu.data.dataset import SongNpz

    notes = np.array([[i * 4, 60 + i % 12, 2, 80, 0] for i in range(64)], np.int64)
    table = np.searchsorted(notes[:, 0], np.arange(64 * 4 + 129))
    np.savez(
        str(tmp_path / "s.npz"),
        notes=notes,
        start_table=table,
        db_pos=np.arange(0, 16 * 16, 16),
        db_pos_filter=np.ones(16, bool),
    )
    song = SongNpz("s.npz", str(tmp_path))
    p2c, pt, chd, pr = song[0]
    assert chd.shape == (32, 14) and chd.sum() == 0
    assert p2c[0].sum() > 0


def test_frozen_encoders_from_converted_npz(tmp_path):
    """build_frozen_encoders consumes pre-converted .npz checkpoints."""
    import jax.numpy as jnp

    from polyffusion_tpu.convert.__main__ import save_params_npz
    from polyffusion_tpu.models.encoders import ChordEncoder, build_frozen_encoders

    enc = ChordEncoder(hidden_dim=512, z_dim=512)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 36)))["params"]
    save_params_npz({"chord_enc": params}, str(tmp_path / "chd8bar.npz"))

    cfg = Params(cond_type="chord", use_enc=True, chd_hidden_dim=512, chd_z_dim=512)
    kwargs = build_frozen_encoders(cfg, str(tmp_path))
    assert "chord_enc" in kwargs and "chord_enc_params" in kwargs
    mu, std = kwargs["chord_enc"].apply(
        {"params": kwargs["chord_enc_params"]}, jnp.zeros((2, 32, 36))
    )
    assert mu.shape == (2, 512)


def test_concat_blurry_task_and_inference():
    """sdf_concat: blurry-image channel conditioning trains and samples."""
    import jax.numpy as jnp

    cfg = Params({**TINY_CFG, "in_channels": 4, "concat_blurry": True,
                  "concat_ratio": 0.25, "cond_mode": "uncond"})
    task = SDFTask(cfg)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    batch = (
        jnp.zeros((2, 2, 128, 128)).at[:, 0, ::8, 60].set(1.0),
        jnp.zeros((2, 128, 20, 6), jnp.int64),
        jnp.zeros((2, 32, 36)),
        jnp.zeros((2, 128, 128)),
    )
    loss, _ = task.loss_fn(params, batch, jax.random.PRNGKey(1), {})
    assert np.isfinite(float(loss))

    session = InferenceSession(task, params, use_ddim=True, ddim_steps=2)
    cond = np.zeros((1, 1, cfg.d_cond), np.float32)
    orig = np.zeros((1, 2, 128, 128), np.float32)
    orig[:, 0, ::8, 60] = 1.0
    gen, _ = session.inpaint(orig, "bars", cond, bar_list=[2, 3], no_output=True)
    assert gen.shape == (1, 2, 128, 128) and np.isfinite(gen).all()


def test_remat_training_step_matches():
    """remat=True must give the same loss (and finite grads) as remat=False."""
    import jax.numpy as jnp

    batch = (
        jnp.zeros((2, 2, 128, 128)).at[:, 0, ::8, 60].set(1.0),
        jnp.zeros((2, 128, 20, 6), jnp.int64),
        jnp.zeros((2, 32, 36)),
        jnp.zeros((2, 128, 128)),
    )
    losses = []
    for remat in (False, True):
        cfg = Params({**TINY_CFG, "remat": remat})
        task = SDFTask(cfg)
        params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
        loss, _ = task.loss_fn(params, batch, jax.random.PRNGKey(1), {})
        g = jax.grad(lambda p: task.loss_fn(p, batch, jax.random.PRNGKey(1), {})[0])(params)
        gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        losses.append((float(loss), gnorm))
    assert abs(losses[0][0] - losses[1][0]) < 1e-5
    assert np.isfinite(losses[1][1]) and losses[1][1] > 0


def test_mesh_sharded_sampling():
    """InferenceSession with a dp mesh batch-shards sampling across 8 devices."""
    from polyffusion_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8
    task = SDFTask(TINY_CFG)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    mesh = make_mesh()
    session = InferenceSession(task, params, use_ddim=True, ddim_steps=2, mesh=mesh)
    cond = np.zeros((8, 1, TINY_CFG.d_cond), np.float32)
    gen = session.predict(cond, uncond_scale=3.0)
    assert gen.shape == (8, 2, 128, 128)
    assert np.isfinite(gen).all()

    # unsharded session gives the same result (same rng stream)
    session2 = InferenceSession(task, params, use_ddim=True, ddim_steps=2)
    gen2 = session2.predict(cond, uncond_scale=3.0)
    np.testing.assert_allclose(gen, gen2, atol=2e-4)


def test_generation_determinism():
    """Same seed -> identical samples; different seed -> different samples."""
    task = SDFTask(TINY_CFG)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    cond = np.zeros((2, 1, TINY_CFG.d_cond), np.float32)
    a = InferenceSession(task, params, use_ddim=True, ddim_steps=2, seed=7).predict(cond)
    b = InferenceSession(task, params, use_ddim=True, ddim_steps=2, seed=7).predict(cond)
    c = InferenceSession(task, params, use_ddim=True, ddim_steps=2, seed=8).predict(cond)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3


def test_chord_label_roundtrip():
    """encode_to_absolute_row -> label_from_chd_row inverts exactly for the
    recognizer vocabulary (incl. inversions), and falls back sensibly."""
    from polyffusion_tpu.chord.encode import encode_to_absolute_row
    from polyffusion_tpu.chord.labels import (
        beat_labels_to_intervals,
        label_from_chd_row,
        labels_from_chord_matrix,
    )

    for lab in ["C:maj", "A:min7/b7", "F#:sus4(b7)", "Eb:dim7", "G:7/3"]:
        row = encode_to_absolute_row(lab)
        assert label_from_chd_row(row) == lab, lab
    assert label_from_chd_row([0] * 14) == "N"
    # labels whose mir_eval bitmap differs from the recognizer template fall
    # back to the nearest-scored template: same root and triad class
    assert label_from_chd_row(encode_to_absolute_row("B:maj9")) == "B:maj7"

    mat = np.array([encode_to_absolute_row("C:maj")] * 4
                   + [encode_to_absolute_row("F:maj")] * 4, np.float32)
    labs = labels_from_chord_matrix(mat)
    iv, merged = beat_labels_to_intervals(labs)
    assert merged == ["C:maj", "F:maj"]
    np.testing.assert_allclose(iv, [[0.0, 2.0], [2.0, 4.0]])


def test_chd_acc_scores_oracle_performance():
    """The full control-fidelity path (MIDI write -> recognize -> mir_eval
    scoring) must score ~1.0 on a piano roll that literally PLAYS the
    conditioning chords (metric-validity oracle for expr --type chd_acc)."""
    from polyffusion_tpu.chord.eval import evaluate
    from polyffusion_tpu.chord.labels import beat_labels_to_intervals

    TONES = {"C:maj": [48, 60, 64, 67], "F:maj": [53, 65, 69, 72],
             "G:maj": [55, 67, 71, 74], "A:min": [45, 57, 60, 64]}
    prog = (["C:maj"] * 8 + ["F:maj"] * 8 + ["G:maj"] * 8 + ["A:min"] * 8)
    roll = np.zeros((2, 128, 128), np.float32)
    for beat, lab in enumerate(prog):
        s = beat * 4
        for p in TONES[lab]:
            roll[0, s, p] = 1.0
            roll[1, s : s + 4, p] = 1.0
    ref_iv, ref_lab = beat_labels_to_intervals(prog)
    est_iv, est_lab = X._recognize_segment(roll)
    res = evaluate(ref_iv, ref_lab, est_iv, est_lab)
    assert res["majmin"] > 0.95, res
    assert res["root"] > 0.95, res
    assert res["seg"] > 0.8, res


def test_chd_acc_experiment_runs(session_task, data_dir, tmp_path):
    """chd_acc sweeps scales with ONE traced-scale executable and emits the
    accuracy table (untrained model: values are the chance floor)."""
    task = session_task[1]
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    session = InferenceSession(
        task, params, use_ddim=True, ddim_steps=2, traced_cfg_scale=True
    )
    args = SimpleNamespace(
        data_dir=data_dir, split_file=None, batch_size=2, batch_num=1,
        output_dir=str(tmp_path), uncond_scale=1.0, scales="0,3",
    )
    table = X.EXPERIMENTS["chd_acc"](session, task, args)
    assert set(table) == {0.0, 3.0}
    for row in table.values():
        assert set(row) == {"majmin", "triads", "root", "mirex", "seg"}
        assert all(0.0 <= v <= 1.0 for v in row.values())
    assert len(session._paint_cache) == 1  # one executable for the whole sweep
    import os

    assert os.path.exists(os.path.join(tmp_path, "chd_acc.json"))


def test_synth_corpus_vary_texture_diversifies_rhythm(tmp_path):
    """vary_texture must produce between-song rhythm-skeleton variance —
    without it, txt_acc's matched and shuffled pairings are indistinguishable
    (measured: identical scores on the homogeneous corpus)."""
    from polyffusion_tpu.data.dataset import SegmentDataset
    from polyffusion_tpu.expr import onset_step_f1
    from polyffusion_tpu.tools import synth_corpus

    d_plain, d_vary = str(tmp_path / "plain"), str(tmp_path / "vary")
    synth_corpus(d_plain, n_songs=8, n_bars=8, seed=0, vary_texture=False)
    synth_corpus(d_vary, n_songs=8, n_bars=8, seed=0, vary_texture=True)

    def first_segments(d):
        # one 8-bar prmat2c per song
        return [song[0][0] for song in SegmentDataset.from_dir(d).songs]

    def cross_f1(segs):
        vals = []
        for i in range(len(segs)):
            for j in range(i + 1, len(segs)):
                vals.append(onset_step_f1(segs[i], segs[j]))
        return float(np.mean(vals))

    plain, vary = first_segments(d_plain), first_segments(d_vary)
    f1_plain, f1_vary = cross_f1(plain), cross_f1(vary)
    # homogeneous corpus: every song shares the same onset skeleton
    assert f1_plain > 0.95, f1_plain
    # varied corpus: cross-song rhythm overlap drops substantially
    assert f1_vary < 0.8, (f1_plain, f1_vary)


def test_synth_corpus_vary_texture_keeps_chord_purity(tmp_path):
    """Texture archetypes must not break the corpus's harmonic ground truth:
    every note stays a chord tone of its bar's labeled chord."""
    import os

    from polyffusion_tpu.tools import synth_corpus

    d = str(tmp_path / "vt")
    synth_corpus(d, n_songs=4, n_bars=8, seed=3, vary_texture=True)
    for fn in sorted(os.listdir(d)):
        data = np.load(os.path.join(d, fn), allow_pickle=True)
        chord = np.asarray(data["chord"])  # (beats, 14): root, chroma, bass
        notes = data["notes"]
        tracks = notes if notes.dtype == object else [notes]
        for track in tracks:
            for onset, pitch, dur, *_ in np.asarray(track):
                bar = int(onset) // 16
                chroma = chord[bar * 4, 1:13]  # absolute pitch-class chroma
                assert chroma[int(pitch) % 12] == 1, (fn, onset, pitch)


def test_control_fidelity_sweeps_support_joint_cond(data_dir, tmp_path):
    """chd_acc and txt_acc must feed a chord+txt model the FULL concatenated
    conditioning (d_cond = chd_z + 4*txt_z), not just the axis under test."""
    from polyffusion_tpu.models.encoders import ChordEncoder, TextureEncoder

    chd = ChordEncoder(hidden_dim=64, z_dim=32)
    chd_params = chd.init(
        jax.random.PRNGKey(1), np.zeros((1, 32, 36), np.float32)
    )["params"]
    txt = TextureEncoder(emb_size=64, hidden_dim=128, z_dim=16, num_channel=10)
    txt_params = txt.init(
        jax.random.PRNGKey(2), np.zeros((1, 32, 128), np.float32)
    )["params"]
    cfg = Params({**TINY_CFG, "d_cond": 96, "cond_type": "chord+txt",
                  "use_enc": True})
    task = SDFTask(cfg, chord_enc=chd, chord_enc_params=chd_params,
                   txt_enc=txt, txt_enc_params=txt_params)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    session = InferenceSession(
        task, params, use_ddim=True, ddim_steps=2, traced_cfg_scale=True
    )
    args = SimpleNamespace(
        data_dir=data_dir, split_file=None, batch_size=2, batch_num=1,
        output_dir=str(tmp_path), uncond_scale=1.0, scales="0,3", seed=0,
    )
    for kind in ("chd_acc", "txt_acc"):
        table = X.EXPERIMENTS[kind](session, task, args)
        assert set(table) == {0.0, 3.0}, kind
