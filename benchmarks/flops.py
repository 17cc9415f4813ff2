"""Exact workload arithmetic via XLA cost analysis (BASELINE.md derivation).

Counts the compiled FLOPs and fused-traffic estimate of one UNet evaluation of
the flagship (sdf_chd8bar) config, and scales to the headline benchmark workload
(DDIM-50 + CFG: 100 evals/sample).  Runs on CPU in seconds.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

import jax.numpy as jnp

from polyffusion_tpu.config import load_params
from polyffusion_tpu.parallel.mesh import init_on_cpu
from polyffusion_tpu.tasks import SDFTask


def main():
    cfg = load_params("sdf_chd8bar")  # fp32 graph for clean counting
    task = SDFTask(cfg)
    params = init_on_cpu(task.init_params, jax.random.PRNGKey(0))
    b = 2  # one CFG pair
    args = (
        jnp.zeros((b, 128, 128, 2)),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, 1, cfg.d_cond)),
    )
    cost = (
        jax.jit(lambda p, x, t, c: task.apply_eps(p, x, t, c))
        .lower(params, *args)
        .compile()
        .cost_analysis()
    )
    if isinstance(cost, list):
        cost = cost[0]
    flops_pair = cost["flops"]
    print(f"UNet fwd, one CFG pair (batch 2):   {flops_pair/1e9:9.2f} GFLOP")
    print(f"per single eval (batch-1 equiv):    {flops_pair/2e9:9.2f} GFLOP")
    print(f"per sample (50 DDIM steps x pair):  {50*flops_pair/1e12:9.3f} TFLOP")
    byt = cost.get("bytes accessed", 0.0)
    print(f"XLA fused traffic, one CFG pair:    {byt/1e9:9.2f} GB (fp32 graph)")
    print(f"per sample (x50):                   {50*byt/1e9:9.1f} GB")


if __name__ == "__main__":
    main()
