"""`benchmark-matmult` — quantized-vs-float matmul throughput microbench
(examples/benchmark/benchmark-matmult.cpp:60-203), TPU edition: times the
fused Pallas dequant-matmul against the dense bf16 MXU path at the
reference's shapes (11008 x 4096 x 128) and reports GFLOPS + achieved HBM
bandwidth."""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qmatmul import q_matmul
from ..ops.qtensor import QTensor
from ..quant.types import GGMLType


def build_parser(p: argparse.ArgumentParser | None = None):
    p = p or argparse.ArgumentParser("benchmark-matmult", description=__doc__)
    p.add_argument("-i", "--iterations", type=int, default=10)
    p.add_argument("--sizex", type=int, default=11008)
    p.add_argument("--sizey", type=int, default=4096)
    p.add_argument("--sizez", type=int, default=128)
    p.add_argument("-t", "--type", default="q4_0")
    return p


def _time(fn, iters: int) -> float:
    out = fn()
    np.asarray(out)  # hard sync (D2H — axon block_until_ready is a no-op)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def run(args) -> int:
    n, k, b = args.sizex, args.sizey, args.sizez
    qtype = GGMLType[args.type.upper()]
    rng = np.random.default_rng(0)
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((b, k), dtype=np.float32))
    qw = QTensor.quantize(w, qtype)
    dw = jnp.asarray(w, jnp.bfloat16)
    flops = 2.0 * n * k * b

    t_dense = _time(jax.jit(lambda: q_matmul(x, dw)).lower().compile(), args.iterations)
    t_quant = _time(jax.jit(lambda: q_matmul(x, qw)).lower().compile(), args.iterations)

    qbytes = qw.levels_t.nbytes + qw.gscale_t.nbytes + (
        qw.gbias_t.nbytes if qw.gbias_t is not None else 0)
    print(f"dense bf16 : {t_dense * 1e3:8.3f} ms  {flops / t_dense / 1e9:10.1f} GFLOPS")
    print(f"{qtype.name:10s} : {t_quant * 1e3:8.3f} ms  {flops / t_quant / 1e9:10.1f} GFLOPS"
          f"  ({qbytes / t_quant / 1e9:.1f} GB/s weight stream)")
    print(f"speedup quantized/dense: {t_dense / t_quant:.2f}x")
    return 0


def main(argv=None) -> int:
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
