"""Profiling and micro-benchmark utilities.

TPU equivalent of the reference's in-op benchmarking (`bench` attr +
`Benchmark` RAII timer printing ms/GBps/GFLOPS,
/root/reference/src/gpu_types.cc:43-84) and its nvprof harness
(test/nvprof_mpi.sh): a wall-clock `Benchmark` class with the same
reporting format, a loop-inside-jit `bench_op` that excludes dispatch
overhead, and `trace()` wrapping jax.profiler for TensorBoard traces.
"""
from __future__ import annotations

import contextlib
import time

import jax


class Benchmark:
    """RAII timer printing ms / GBps / GFLOPS (reference format)."""

    def __init__(self, name, bytes_accessed=0, flops=0, repeat=1):
        self.name = name
        self.bytes = bytes_accessed
        self.flops = flops
        self.repeat = max(repeat, 1)

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        ms = (time.perf_counter() - self.t0) * 1000.0 / self.repeat
        gbps = self.bytes / (ms * 1e6) if self.bytes else 0.0
        gflops = self.flops / (ms * 1e6) if self.flops else 0.0
        print(f"%{ms:9.6f} msecs {gbps:8.1f} GBps {gflops:9.1f} GFLOPS "
              f"({self.name})")
        return False


def bench_op(fn, *args, iters=20, flops=0, bytes_accessed=0, name=None):
    """Time `fn(*args)` with a chained lax.scan inside one jit (one
    dispatch, no inter-call pipelining artifacts).  The first argument
    is used as the loop carry and must match fn's output shape/dtype.
    Returns seconds per iteration (and prints if name given)."""
    @jax.jit
    def run(x, rest):
        def body(x, _):
            return fn(x, *rest), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    x0, rest = args[0], args[1:]
    y = run(x0, rest)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = run(x0, rest)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    if name:
        with Benchmark(name, bytes_accessed, flops, 1):
            time.sleep(0)  # report via the same format
        ms = dt * 1e3
        print(f"{name}: {ms:.3f} ms"
              + (f"  {flops/dt/1e12:.2f} TFLOP/s" if flops else "")
              + (f"  {bytes_accessed/dt/1e9:.1f} GB/s"
                 if bytes_accessed else ""))
    return dt


@contextlib.contextmanager
def trace(logdir="/tmp/bs_trace"):
    """jax.profiler trace context (view in TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def memory_analysis(fn, *args, **kwargs):
    """Compile-time memory breakdown of a jitted function.

    TPU-native analog of the reference's memory timeline tool
    (/root/reference/examples/lstm/memory_util.py, which parses
    allocator verbose logs): XLA's compile-time analysis reports the
    peak temp/argument/output/alias HBM for the optimized program —
    the same "will it fit / what dominates" question, answered without
    running.  Returns a dict in bytes.
    """
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ma = compiled.memory_analysis()
    if ma is None:  # backend without analysis support
        return None
    out = {}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k.replace("_in_bytes", "")] = int(v)
    out["peak_estimate"] = (out.get("temp_size", 0)
                            + out.get("argument_size", 0)
                            + out.get("output_size", 0)
                            - out.get("alias_size", 0))
    return out


def live_buffers(backend=None):
    """Live device arrays grouped per device: [(shape, dtype, nbytes)],
    plus a total — the runtime half of the memory tooling."""
    per_dev = {}
    total = 0
    for buf in jax.live_arrays(backend):
        for shard in getattr(buf, "addressable_shards", []):
            dev = str(shard.device)
            nbytes = shard.data.nbytes
            per_dev.setdefault(dev, []).append(
                (tuple(buf.shape), str(buf.dtype), int(nbytes)))
            total += nbytes
    return {"per_device": per_dev, "total_bytes": int(total)}
