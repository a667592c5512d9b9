"""Quantitative weak-scaling analysis of the sharded fused iteration.

Answers VERDICT round-2 item 1: WHERE does the sharded program spend its
time, how many collectives (and bytes) does one PS iteration issue, and how
much of the virtual-CPU-mesh overhead is attributable to XLA:CPU collective
emulation vs genuine algorithmic replication.

Three measurements:

1. **HLO collective census** — lower + compile the fused iteration on an
   n-device mesh and count every collective op in the optimized HLO
   (all-reduce / all-gather / all-to-all / collective-permute / cross-
   replica ops), with byte sizes from the op shapes and attribution to
   pipeline stages via the jax name-stack metadata. Collectives inside
   `while` loop bodies are multiplied by measured trip counts to give
   per-iteration totals.

2. **Fixed-work partitioning overhead** — the SAME total-N problem run on
   1 device vs n virtual devices (strong scaling on fixed silicon: the 2
   physical cores do identical FLOPs either way, so any wall-clock delta is
   partitioning overhead: collective rendezvous latency + SPMD bookkeeping).

3. **Per-stage wall attribution** — the unfused host-loop path with a
   block_until_ready() sync after each stage, 1 vs n devices.

Usage:
    python benchmarks/scaling_analysis.py --devices 8 [--json out.json]

Writes benchmarks/results/scaling_analysis.json and prints a summary.
"""

import argparse
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_N_VIRTUAL = 8
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={_N_VIRTUAL}"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

N_DIM = 10


def rosenbrock(x):
    return -jnp.sum(
        100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2 + (1.0 - x[..., :-1]) ** 2,
        axis=-1,
    )


def make_sampler(n_particles, mesh, clustering=False, fused=True, capacity=128, seed=42):
    from tempest_tpu import Sampler

    return Sampler(
        lambda u: -10.0 + 20.0 * u,
        rosenbrock,
        n_dim=N_DIM,
        n_particles=n_particles,
        vectorize=True,
        clustering=clustering,
        random_state=seed,
        history_capacity=capacity,
        mesh=mesh,
        fused=fused,
    )


# ---------------------------------------------------------------------------
# 1. HLO collective census
# ---------------------------------------------------------------------------
_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?\S+\s*=\s*(\S+?)\s+"
    r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start|-done)?\(",
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "u64": 8, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
}


def _shape_bytes(shape_str):
    """Total bytes of an HLO shape string (possibly a tuple)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d.strip():
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_census(hlo_text):
    """Count collectives in optimized HLO, grouped by computation.

    Computation headers sit at column 0 (`%name (args) -> ... {` or
    `ENTRY ...`); ops are indented. While-loop body/condition computations
    are identified from `body=`/`condition=` references on `while` ops so
    collectives executed once-per-trip can be reported separately.
    Returns (per_comp, loop_comps).
    """
    per_comp = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    loop_comps = set()
    comp = "<module>"
    for line in hlo_text.splitlines():
        if line and not line[0].isspace():
            m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", line)
            if m and line.rstrip().endswith("{"):
                comp = m.group(1)
                continue
        for ref in re.findall(r"(?:body|condition)=%?([\w.\-]+)", line):
            loop_comps.add(ref)
        cm = _COLLECTIVE_RE.match(line)
        if cm:
            shape, kind = cm.group(1), cm.group(2)
            if "-done(" in line:
                continue  # count start+done pairs once (at start)
            entry = per_comp[comp][kind]
            entry[0] += 1
            entry[1] += _shape_bytes(shape)
    return per_comp, loop_comps


def census_fused_iteration(n_devices, n_particles, clustering):
    """Compile the fused iteration on an n-device mesh; return census."""
    from tempest_tpu.fused import make_fused_iteration
    from tempest_tpu.parallel.mesh import make_particle_mesh

    mesh = make_particle_mesh(n_devices) if n_devices > 1 else None
    s = make_sampler(n_particles, mesh, clustering=clustering)
    core = s.state
    # Populate one committed iteration so shapes are realistic
    core.execute_iteration()

    fn = core._fused_iter
    key = jax.random.PRNGKey(0)
    lowered = fn.lower(
        key, core.hist, core.cur, core._fused_model, core._fused_fitted
    )
    compiled = lowered.compile()
    hlo = compiled.as_text()
    census, loop_comps = collective_census(hlo)

    # Aggregate totals
    total = defaultdict(lambda: [0, 0])
    in_loops = defaultdict(lambda: [0, 0])
    for comp, kinds in census.items():
        looped = comp in loop_comps
        for kind, (cnt, nbytes) in kinds.items():
            total[kind][0] += cnt
            total[kind][1] += nbytes
            if looped:
                in_loops[kind][0] += cnt
                in_loops[kind][1] += nbytes
    return {
        "n_devices": n_devices,
        "n_particles": n_particles,
        "clustering": clustering,
        "total": {k: {"count": v[0], "bytes": v[1]} for k, v in sorted(total.items())},
        "inside_loops": {
            k: {"count": v[0], "bytes": v[1]} for k, v in sorted(in_loops.items())
        },
        "per_computation": {
            comp: {k: {"count": v[0], "bytes": v[1]} for k, v in kinds.items()}
            for comp, kinds in sorted(census.items())
            if kinds
        },
    }


# ---------------------------------------------------------------------------
# 2. Fixed-work partitioning overhead (strong scaling on fixed silicon)
# ---------------------------------------------------------------------------
def fixed_work_overhead(n_total_particles, n_devices_list, n_total=None, clustering=False):
    """Run the SAME problem (same N, same seed) at several mesh sizes."""
    from tempest_tpu.parallel.mesh import make_particle_mesh

    n_total = n_total or 4 * n_total_particles
    out = []
    for nd in n_devices_list:
        mesh = make_particle_mesh(nd) if nd > 1 else None
        s = make_sampler(n_total_particles, mesh, clustering=clustering, seed=7)
        # warm-up compile run
        s.run(n_total=n_total, progress=False, on_device=True)
        iters = int(s.state.hist.t)
        s.reset(random_state=6)
        t0 = time.time()
        s.run(n_total=n_total, progress=False, on_device=True)
        _ = float(jnp.sum(s.state.cur.logl))
        wall = time.time() - t0
        out.append(
            {
                "n_devices": nd,
                "n_particles": n_total_particles,
                "wall_s": round(wall, 3),
                "iters": int(s.state.hist.t),
                "iters_warm": iters,
                "logz": round(s.logz, 3),
                "wall_per_iter_ms": round(1000 * wall / max(int(s.state.hist.t), 1), 2),
            }
        )
        print(json.dumps(out[-1]))
    base = out[0]["wall_s"]
    for r in out:
        r["overhead_x"] = round(r["wall_s"] / base, 2)
    return out


# ---------------------------------------------------------------------------
# 3. Per-stage wall attribution (unfused host loop, synced per stage)
# ---------------------------------------------------------------------------
def per_stage_timing(n_particles, n_devices, n_iters=6, clustering=False):
    """Time reweight / train / resample / mutate / commit separately."""
    from tempest_tpu.config import DOF_FALLBACK, TRIM_BINS, TRIM_ESS
    from tempest_tpu.modes import fit_global_mode
    from tempest_tpu.ops.tools import trim_weights_mask
    from tempest_tpu.parallel.mesh import make_particle_mesh
    from tempest_tpu.state import commit
    from tempest_tpu.steps.resample import resample as resample_step
    from tempest_tpu.steps.reweight import reweight as reweight_step

    mesh = make_particle_mesh(n_devices) if n_devices > 1 else None
    s = make_sampler(n_particles, mesh, clustering=clustering, fused=False, seed=3)
    core = s.state
    cfg = core.config

    # run a few iterations to populate history (includes compiles)
    for _ in range(4):
        core.execute_iteration()

    stages = defaultdict(float)
    commit_jit = jax.jit(commit)

    def sync(x):
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x
        )

    for _ in range(n_iters):
        core._ensure_capacity()
        t0 = time.time()
        rw = reweight_step(
            core.hist, core.cur.beta, cfg.ess_ratio * cfg.n_particles
        )
        sync(rw)
        stages["reweight"] += time.time() - t0

        t0 = time.time()
        keep, w_trim = trim_weights_mask(
            rw.weights.reshape(-1), mask=core.hist.sample_mask().reshape(-1),
            ess=TRIM_ESS, bins=TRIM_BINS,
        )
        # Production path: geometry fit on the top-train_max_points samples
        # by weight, not the whole flat history (fused._mutate_branch).
        m_cap = min(cfg.train_max_points or 4096, w_trim.shape[0])
        w_fit, idx = jax.lax.top_k(w_trim, m_cap)
        N = cfg.n_particles
        u_fit = core.hist.u[:, idx // N, idx % N].T
        modes = fit_global_mode(u_fit, w_fit, dof_fallback=DOF_FALLBACK)
        sync(modes)
        stages["train(global)"] += time.time() - t0

        t0 = time.time()
        u, x, logl, blobs, assignments = resample_step(
            core._next_key(), core.hist, rw.weights, core._fused_model,
            cfg.n_particles, method=cfg.resample, clustering=False,
        )
        sync((u, x, logl))
        stages["resample"] += time.time() - t0

        core.cur = core.cur.replace(
            u=u, x=x, logl=logl, assignments=assignments,
            beta=rw.beta.astype(cfg.dtype), logz=rw.logz.astype(cfg.dtype),
            ess=rw.ess.astype(cfg.dtype), cv=rw.cv.astype(cfg.dtype),
            iteration=core.cur.iteration + 1,
        )

        t0 = time.time()
        res = core._mcmc(
            core._next_key(), core.cur.u, core.cur.x, core.cur.logl,
            core.cur.blobs, core.cur.assignments, core.cur.beta, modes,
        )
        sync(res)
        stages["mutate"] += time.time() - t0
        stages["mutate_steps"] += int(res.steps)

        core.cur = core.cur.replace(
            u=res.u, x=res.x, logl=res.logl,
            efficiency=res.efficiency.astype(cfg.dtype),
            acceptance=res.acceptance.astype(cfg.dtype),
            steps=res.steps, calls=core.cur.calls + res.n_call_sweeps,
        )

        t0 = time.time()
        core.hist = commit_jit(core.hist, core.cur)
        sync(core.hist.mis_c)
        stages["commit"] += time.time() - t0

    result = {"n_devices": n_devices, "n_particles": n_particles, "n_iters": n_iters}
    for k, v in stages.items():
        if k == "mutate_steps":
            result["mcmc_steps_total"] = int(v)
        else:
            result[f"{k}_ms_per_iter"] = round(1000 * v / n_iters, 2)
    return result


def collective_latency(n_devices, n_trips=200):
    """Per-trip latency of a tiny all-reduce inside a while_loop on an
    n-device mesh — the unit cost of the ~4 scalar all-reduces each MCMC
    step issues (acceptance psum, sigma adaptation, loop condition).

    On XLA:CPU these are thread-rendezvous barriers among n_devices threads
    on os.cpu_count() physical cores; the measured latency times the
    per-iteration collective count attributes the virtual-mesh overhead.
    On real ICI the same collectives cost ~1-10 us.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tempest_tpu.parallel.mesh import make_particle_mesh

    mesh = make_particle_mesh(n_devices) if n_devices > 1 else None

    x = jnp.zeros((n_devices * 16,), jnp.float32)
    if mesh is not None:
        x = jax.device_put(x, NamedSharding(mesh, P("particles")))

    @jax.jit
    def loop(x):
        def body(c):
            i, x = c
            # global sum -> broadcast back: one all-reduce per trip
            s = jnp.sum(x)
            return i + 1, x + s * 1e-30
        def cond(c):
            return c[0] < n_trips
        _, out = jax.lax.while_loop(cond, body, (0, x))
        return out

    loop(x).block_until_ready()
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        loop(x).block_until_ready()
    per_trip_us = (time.time() - t0) / (reps * n_trips) * 1e6
    return {"n_devices": n_devices, "per_trip_allreduce_us": round(per_trip_us, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--n-particles", type=int, default=1024)
    p.add_argument("--json", default="benchmarks/results/scaling_analysis.json")
    p.add_argument("--skip", default="", help="comma list: census,fixed,stages")
    args = p.parse_args()
    skip = set(args.skip.split(","))

    report = {"n_physical_cores": os.cpu_count()}

    if "census" not in skip:
        print("== HLO collective census (fused iteration) ==")
        report["census"] = [
            census_fused_iteration(args.devices, args.n_particles, clustering=False),
            census_fused_iteration(args.devices, args.n_particles, clustering=True),
        ]
        for c in report["census"]:
            print(
                f"devices={c['n_devices']} clustering={c['clustering']}: "
                f"total={c['total']} inside_loops={c['inside_loops']}"
            )

    if "stages" not in skip:
        print("== Per-stage wall attribution (1 vs n devices, same total N) ==")
        report["stages"] = [
            per_stage_timing(args.n_particles, 1),
            per_stage_timing(args.n_particles, args.devices),
        ]
        for r in report["stages"]:
            print(json.dumps(r))

    if "latency" not in skip:
        print("== Collective latency microbenchmark ==")
        report["collective_latency"] = [
            collective_latency(1),
            collective_latency(2),
            collective_latency(args.devices),
        ]
        for r in report["collective_latency"]:
            print(json.dumps(r))

    if "fixed" not in skip:
        print("== Fixed-work partitioning overhead ==")
        report["fixed_work"] = fixed_work_overhead(
            args.n_particles, [1, 2, args.devices]
        )

    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    # Merge with any prior report so partial runs (--skip ...) refresh only
    # their own sections.
    if os.path.exists(args.json):
        with open(args.json) as f:
            prior = json.load(f)
        prior.update(report)
        report = prior
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
