"""Diagnose the whole-run fused program's layout-assignment memory blowup.

CLAUDE.md round-5 open item: at 100-D x N=49152 x cap192 (7.1 GiB args)
the whole-run program needs 19.87G vs 15.75G HBM because the compile
carries TWO full-history temporaries in permuted layouts ({0,2,1} d-minor
and {2,0,1}) as remat compress/uncompress pairs. This probe AOT-compiles
the exact program at an arbitrary (n, capacity) WITHOUT running it,
prints `memory_analysis()`, and scans the optimized HLO for
history-shaped buffers in non-default layouts so layout-pin experiments
can iterate at small (fast-compiling, in-memory) sizes before paying the
one large confirmation compile.

Usage:
    python benchmarks/fused_layout_probe.py [--n 4096] [--capacity 192]
        [--pin-layouts] [--compiler-option xla_foo=bar ...]
"""

import argparse
import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

N_DIM = 100


def prior(u):
    return -10.0 + 20.0 * u


def loglike(x):
    return -jnp.sum(
        100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2 + (1.0 - x[..., :-1]) ** 2,
        axis=-1,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--capacity", type=int, default=192)
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--train-max-points", type=int, default=None)
    p.add_argument(
        "--program",
        choices=("run", "iter"),
        default="run",
        help="probe the whole-run program or the per-iteration program",
    )
    p.add_argument(
        "--compiler-option",
        action="append",
        default=[],
        help="key=value env_option_overrides passed to compile()",
    )
    p.add_argument("--dump-hlo", default=None, help="write optimized HLO here")
    args = p.parse_args()

    from tempest_tpu import Sampler
    from tempest_tpu.fused import make_fused_iteration, make_fused_run

    s = Sampler(
        prior,
        loglike,
        n_dim=N_DIM,
        n_particles=args.n,
        vectorize=True,
        clustering=False,
        random_state=args.seed,
        history_capacity=args.capacity,
        train_max_points=args.train_max_points,
    )
    core = s.state
    if args.program == "run":
        runner = make_fused_run(
            core.config, core._loglike_batch, core._prior_batch, core.have_blobs
        )
        concrete = (
            core.key,
            core.hist,
            core.cur,
            jnp.asarray(8192, jnp.int32),
            core._fused_model,
            core._fused_fitted,
            jnp.asarray(args.capacity, jnp.int32),
        )
    else:
        runner = make_fused_iteration(
            core.config, core._loglike_batch, core._prior_batch, core.have_blobs
        )
        concrete = (
            core.key,
            core.hist,
            core.cur,
            core._fused_model,
            core._fused_fitted,
        )
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), concrete
    )

    t0 = time.time()
    lowered = runner.lower(*abstract)
    t_lower = time.time() - t0

    opts = {}
    for kv in args.compiler_option:
        k, _, v = kv.partition("=")
        opts[k] = v
    t0 = time.time()
    compiled = lowered.compile(compiler_options=opts or None)
    t_compile = time.time() - t0

    mem = compiled.memory_analysis()
    report = {
        "n": args.n,
        "capacity": args.capacity,
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "compiler_options": opts,
    }
    if mem is not None:
        for k in (
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "alias_size_in_bytes",
            "temp_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(mem, k, None)
            if v is not None:
                report[k.replace("_in_bytes", "_gib")] = round(v / 2**30, 3)

    # Scan the optimized HLO for big buffers in non-default layouts. A
    # default (descending minor-to-major) layout for rank-3 is {2,1,0};
    # anything else on a history-sized tensor is a transposed copy.
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
    shapes = collections.Counter()
    big_dims = {args.n, args.capacity, N_DIM}
    for m in re.finditer(r"f32\[([0-9,]+)\]\{([0-9,]+)(?::[^}]*)?\}", hlo):
        dims = tuple(int(d) for d in m.group(1).split(","))
        layout = tuple(int(d) for d in m.group(2).split(","))
        default = tuple(range(len(dims) - 1, -1, -1))
        if layout != default and len(dims) >= 2 and set(dims) & big_dims:
            shapes[(dims, layout)] += 1
    report["nondefault_layouts"] = [
        {"shape": list(k[0]), "layout": list(k[1]), "count": v}
        for (k, v) in shapes.most_common(20)
    ]
    # Count full-history-shaped temporaries (the smoking gun): any
    # (d, T, N) tensor appearing as a copy/transpose/fusion output.
    hist_shape = f"f32[{N_DIM},{args.capacity},{args.n}]"
    report["history_tensor_mentions"] = hlo.count(hist_shape)
    copies = len(re.findall(r"copy[^\n]*" + re.escape(hist_shape), hlo)) + len(
        re.findall(re.escape(hist_shape) + r"\{[0-9,]+\}[^\n]*copy", hlo)
    )
    report["history_copy_lines"] = copies
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
