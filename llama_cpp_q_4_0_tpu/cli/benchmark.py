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
    p.add_argument("--vdot", action="store_true",
                   help="vector-dot accuracy/speed comparison "
                        "(pocs/vdot/{vdot,q8dot}.cpp analogue)")
    p.add_argument("--stream", action="store_true",
                   help="pure-Pallas HBM read-stream microbench: the "
                        "practical bandwidth ceiling decode is judged "
                        "against (BASELINE.md north star)")
    p.add_argument("--stream-gib", type=float, default=2.0)
    p.add_argument("--stream-tile-mib", type=int, default=4)
    p.add_argument("--stream-sweep", action="store_true",
                   help="sweep stream tile sizes (4..256 MiB) and report "
                        "the best GB/s — the practical roofline number")
    return p


def _stream_once(gib: float, tile_mib: int, iterations: int) -> float:
    """One HBM read-stream measurement at a given tile size -> GB/s.

    The array is passed as a JIT ARGUMENT (device-resident buffer), never
    closed over: the round-3 version baked the 2 GB array into the
    executable as an MLIR constant ("2.15GB of constants captured during
    lowering"), so the run timed constant re-materialization (172 GB/s),
    not HBM streaming — a physically impossible ceiling given decode
    itself sustains ~415 GB/s."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lanes = 65536
    tile_rows = max(8, tile_mib * (1 << 20) // lanes)
    rows = int(gib * (1 << 30)) // lanes
    rows -= rows % tile_rows
    n_k = rows // tile_rows

    def kernel(x_ref, out_ref, *, n_k):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # widen via int32: Mosaic has no direct uint8 -> f32 vector cast
        # (same 8-bit gap family as int8 compare/subtract on v5e)
        out_ref[:] += x_ref[:8, :128].astype(jnp.int32).astype(jnp.float32)

    # Mosaic's DEFAULT scoped-vmem budget is 16 MiB: double-buffered input
    # tiles above 8 MiB blew it on the first sweep ("size 16.00M ... limit
    # 16.00M exceeded by 4.0K", 2026-08-20) — raise the limit to what the
    # tile actually needs (v5e VMEM is 128 MiB; cap below it and let
    # too-big tiles fail loudly in the sweep).
    vmem_need = 2 * tile_rows * lanes + (1 << 20)
    fn = pl.pallas_call(
        functools.partial(kernel, n_k=n_k),
        grid=(n_k,),
        in_specs=[pl.BlockSpec((tile_rows, lanes), lambda k: (k, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(vmem_need, 120 * (1 << 20)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=rows * lanes, transcendentals=0
        ),
    )
    data = jax.device_put(np.ones((rows, lanes), np.uint8))
    jfn = jax.jit(fn)
    t = _time(lambda: jfn(data), iterations)
    return rows * lanes / 1e9 / t


def run_stream(args) -> int:
    """Measure the achievable HBM read bandwidth with a minimal Pallas
    kernel: grid-steps DMA fixed tiles of a large uint8 array into VMEM and
    touch 8 sublanes (the DMA moves the whole block regardless).  Decode is
    weight-stream-bound, so this number — not the 819 GB/s chip spec — is
    the denominator for 'percent of roofline'."""
    # Per-kernel vmem_limit_bytes (CompilerParams) is the only workable
    # limit-raise mechanism here: it rides the Mosaic kernel params through
    # the remote compile.  Do NOT put --xla_tpu_scoped_vmem_limit_kib in
    # XLA_FLAGS — the LOCAL jaxlib's flag parser does not know TPU flags
    # and aborts the process ("Unknown flag in XLA_FLAGS", 2026-08-20).
    if args.stream_sweep:
        best = (0.0, 0)
        # ≤ 56 MiB keeps double-buffered tiles under the 120 MiB vmem cap
        for tile_mib in (4, 8, 16, 32, 56):
            try:
                gbs = _stream_once(args.stream_gib, tile_mib,
                                   args.iterations)
            except Exception as e:  # compile OOM at this tile: keep sweeping
                print(f"HBM read-stream: tile {tile_mib:4d} MiB -> FAILED "
                      f"({type(e).__name__}: {str(e).splitlines()[0][:120]})",
                      flush=True)
                continue
            print(f"HBM read-stream: tile {tile_mib:4d} MiB -> "
                  f"{gbs:.1f} GB/s", flush=True)
            if gbs > best[0]:
                best = (gbs, tile_mib)
        print(f"HBM read-stream BEST: {best[0]:.1f} GB/s "
              f"(tile {best[1]} MiB) over {args.stream_gib:.1f} GiB")
        return 0
    gbs = _stream_once(args.stream_gib, args.stream_tile_mib,
                       args.iterations)
    print(f"HBM read-stream: {args.stream_gib:.2f} GiB at "
          f"{gbs:.1f} GB/s  (tile {args.stream_tile_mib} MiB)")
    return 0


def run_vdot(args) -> int:
    """pocs/vdot parity: compare the quantized dot against the full-float
    dot — error statistics + timing, like vdot.cpp:59-296."""
    import jax

    k = args.sizey
    qtype = GGMLType[args.type.upper()]
    rng = np.random.default_rng(0)
    errs = []
    for trial in range(16):
        w = (rng.standard_normal((1, k)) * 0.5).astype(np.float32)
        x = (rng.standard_normal((1, k)) * 0.5).astype(np.float32)
        qw = QTensor.quantize(w, qtype)
        exact = float(x[0] @ w[0])
        qdot = float(np.asarray(q_matmul(jnp.asarray(x), qw,
                                         use_pallas=False))[0, 0])
        # quantize-then-dot against the *dequantized* weight = the format's
        # intrinsic error (vdot.cpp's "dot" vs "exact dot")
        deq = float(x[0] @ np.asarray(qw.dequantize())[0])
        errs.append((abs(qdot - exact), abs(qdot - deq)))
    errs = np.asarray(errs)
    print(f"{qtype.name} vdot over K={k}, 16 trials:")
    print(f"  |qdot - exact f32 dot|   avg {errs[:, 0].mean():.5f}  "
          f"max {errs[:, 0].max():.5f}  (quantization error)")
    print(f"  |qdot - dequant dot|     avg {errs[:, 1].mean():.5f}  "
          f"max {errs[:, 1].max():.5f}  (compute error)")
    w = (rng.standard_normal((128, k)) * 0.5).astype(np.float32)
    qw = QTensor.quantize(w, qtype)
    x = jnp.asarray((rng.standard_normal((1, k)) * 0.5).astype(np.float32))
    t = _time(jax.jit(lambda: q_matmul(x, qw)).lower().compile(),
              args.iterations)
    print(f"  GEMV latency: {t * 1e6:.1f} us ({2 * 128 * k / t / 1e9:.2f} GFLOPS)")
    return 0


def _time(fn, iters: int) -> float:
    out = fn()
    np.asarray(out)  # hard sync (D2H — axon block_until_ready is a no-op)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def run(args) -> int:
    if args.vdot:
        return run_vdot(args)
    if args.stream:
        return run_stream(args)
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
