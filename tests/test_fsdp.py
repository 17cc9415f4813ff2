"""ZeRO-3 / FSDP sharding (parallel/fsdp.py): one-step numerical parity with
the replicated dp step, real leaf partitioning, and moment/EMA coverage."""

import jax
import numpy as np

from test_tp import CFG, _batch
from polyffusion_tpu.parallel import make_mesh, replicated, shard_batch
from polyffusion_tpu.parallel.fsdp import (
    MIN_SHARD_ELEMS,
    infer_fsdp_sharding,
    shard_state_fsdp,
)
from polyffusion_tpu.parallel.mesh import init_on_cpu
from polyffusion_tpu.tasks import SDFTask
from polyffusion_tpu.train import create_state, make_optimizer, make_train_step

import pytest

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'


def test_fsdp_policy_shards_large_leaves_only():
    task = SDFTask(CFG)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    mesh = make_mesh()  # 8-device dp
    sh = infer_fsdp_sharding(params, mesh)
    kernel = sh["input_blocks_1_0"]["in_conv"]["kernel"]
    assert "dp" in str(kernel.spec), kernel.spec
    # small leaves (norm scales) replicated
    assert sh["input_blocks_1_0"]["in_norm"]["scale"].spec == jax.sharding.PartitionSpec()
    # every sharded leaf really is large and divisible
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(sh, is_leaf=lambda x: hasattr(x, "spec"))
    n_sharded = 0
    for p, s in zip(flat_p, flat_s):
        names = [a for a in jax.tree_util.tree_leaves(tuple(s.spec)) if a]
        if names:
            n_sharded += 1
            assert p.size >= MIN_SHARD_ELEMS
            d = tuple(s.spec).index("dp")
            assert p.shape[d] % 8 == 0, (p.shape, s.spec)
    assert n_sharded > 10  # the bulk of the model is actually sharded


def test_fsdp_step_matches_replicated_dp_step():
    """One train step with ZeRO-3 state sharding == the replicated dp step."""
    task = SDFTask(CFG)
    optimizer = make_optimizer(CFG.learning_rate, CFG.max_grad_norm)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)
    batch = _batch()

    host_params = jax.device_get(params)
    mesh = make_mesh()
    step_dp = make_train_step(task, optimizer, mesh)
    st_dp = jax.device_put(create_state(host_params, optimizer), replicated(mesh))
    step_fs = make_train_step(task, optimizer, mesh, fsdp=True)
    st_fs = shard_state_fsdp(
        create_state(jax.device_get(params), optimizer, ema_decay=0.999), mesh
    )

    st_dp, m_dp = step_dp(st_dp, tuple(shard_batch(batch, mesh)), rng, ())
    st_fs, m_fs = step_fs(st_fs, tuple(shard_batch(batch, mesh)), rng, ())

    assert abs(float(m_dp["loss"]) - float(m_fs["loss"])) < 1e-4
    a = np.asarray(st_dp.params["input_blocks_1_0"]["in_conv"]["kernel"])
    b = np.asarray(st_fs.params["input_blocks_1_0"]["in_conv"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-5)

    # the fsdp state really is sharded: each device holds 1/8 of the kernel
    kern = st_fs.params["input_blocks_1_0"]["in_conv"]["kernel"]
    assert "dp" in str(kern.sharding.spec)
    shard = kern.addressable_shards[0].data
    assert shard.size == kern.size // 8, (shard.shape, kern.shape)

    # Adam moments and the EMA branch carry the same ZeRO-3 sharding
    flat = jax.tree_util.tree_flatten_with_path(st_fs.opt_state)[0]
    moment_leaves = [
        leaf
        for path, leaf in flat
        if "in_conv" in str(path) and str(path).endswith("key='kernel'))")
    ]
    assert moment_leaves, "no Adam-moment leaves found for in_conv kernels"
    assert all("dp" in str(l.sharding.spec) for l in moment_leaves)
    assert "dp" in str(
        st_fs.ema["input_blocks_1_0"]["in_conv"]["kernel"].sharding.spec
    )


def test_fsdp_policy_replicates_without_dp_axis():
    task = SDFTask(CFG)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices()[:1])
    sh = infer_fsdp_sharding(params, mesh)
    assert all(
        s.spec == jax.sharding.PartitionSpec()
        for s in jax.tree_util.tree_leaves(sh, is_leaf=lambda x: hasattr(x, "spec"))
    )


def test_fsdp_trainer_save_resume_roundtrip(tmp_path):
    """Full Trainer loop under fsdp: true — ZeRO-3-sharded state must survive
    the orbax save -> fresh-trainer restore -> re-shard -> continue path."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from synth import make_song_npz
    from polyffusion_tpu.data import SegmentDataset, make_loaders
    from polyffusion_tpu.train import Trainer
    from test_train_e2e import TINY_CFG

    d = tmp_path / "npz"
    d.mkdir()
    for i in range(3):
        make_song_npz(str(d / f"{i}.npz"), n_bars=24, seed=i)

    cfg = TINY_CFG.__class__(dict(TINY_CFG, fsdp=True))
    mesh = make_mesh()
    train_ds, val_ds = SegmentDataset.train_val_from_dir(str(d), 0.75)
    train_dl, val_dl = make_loaders(train_ds, val_ds, 8, mesh)

    out = str(tmp_path / "run")
    trainer = Trainer(task=SDFTask(cfg), cfg=cfg, output_dir=out, mesh=mesh,
                      max_steps=2, log_every=1)
    state = trainer.fit(train_dl, val_dl, resume=False)
    assert int(state.step) == 2
    kern = state.params["input_blocks_1_0"]["in_conv"]["kernel"]
    assert "dp" in str(kern.sharding.spec)

    trainer2 = Trainer(task=SDFTask(cfg), cfg=cfg, output_dir=out, mesh=mesh,
                      max_steps=4, log_every=1)
    state2 = trainer2.fit(train_dl, val_dl, resume=True)
    assert int(state2.step) == 4
    kern2 = state2.params["input_blocks_1_0"]["in_conv"]["kernel"]
    assert "dp" in str(kern2.sharding.spec)
