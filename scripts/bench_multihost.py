"""Multi-host aggregate decode bench: N jax.distributed processes, one GOP
partition each, psum-aggregated frames/s (BASELINE.md's scaling row, measured
on the virtual CPU mesh and CLEARLY LABELED as such — real multi-host TPU
hardware is not reachable from this box).

Each worker is a real `jax.distributed` process that:
  * takes its GOP partition from `multihost.local_partition` (contiguous
    byte ranges, no bulk data over DCN — SURVEY.md §5.8),
  * decodes EXACTLY its [frame_lo, frame_hi) range through the production
    `DecodePipeline.decode(start_frame=, end_frame=)` (parse || device
    overlap, the same code path serving runs),
  * reports per-host frames and wall seconds, aggregated across processes
    with `multihost_utils.process_allgather` (the DCN psum accounting the
    reference's dual-core split did by mailbox counter, core1/main.c:227-335).

The parent runs the SAME workload at 1 host and at N hosts and emits one
JSON line with per-host accounting and scaling efficiency:

    python scripts/bench_multihost.py --hosts 3 [--frames 48] [--out f.json]

Wired into `make soak` at --hosts 2 so the accounting artifact regenerates
with every soak run.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, os, sys, time
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + os.environ["DEVS_PER_HOST"]
).strip()
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])

from mjpeg423_tpu.core import format as fmt
from mjpeg423_tpu.parallel import multihost
from mjpeg423_tpu.runtime import DecodePipeline
from mjpeg423_tpu.utils.config import DecodeConfig

nprocs = int(os.environ["NPROCS"])
pid, n = multihost.initialize(
    coordinator_address=os.environ["COORD"] if nprocs > 1 else None,
    num_processes=nprocs,
    process_id=int(os.environ["PID"]),
)

if os.environ.get("PIN_LO"):
    # Fixed per-host resources: pin this "host" to its own core slice in
    # BOTH the 1-host and N-host runs, so scaling efficiency compares
    # equal hosts instead of one all-cores run against N shared ones.
    os.sched_setaffinity(
        0, range(int(os.environ["PIN_LO"]), int(os.environ["PIN_HI"])))

data = open(os.environ["STREAM"], "rb").read()
index = fmt.index_frames(data)
part = multihost.local_partition(index.gop_starts(), index.num_frames)

pipe = DecodePipeline(DecodeConfig(use_pallas=False, frames_per_batch=8))

if os.environ.get("KERNEL_BOUND") == "1":
    # Kernel-bound configuration (VERDICT r3 #4): the host parse runs
    # ONCE, untimed; the timed region is the sharded decode transform
    # over this partition's pre-parsed amplitudes — isolating the path
    # whose scaling the virtual mesh can measure without host-core
    # parse contention.
    import jax.numpy as jnp
    from mjpeg423_tpu.ops import transform_jax

    hdr = index.header
    w8 = 8
    wins = []
    for s0 in range(part.frame_lo, part.frame_hi, w8):
        c = min(w8, part.frame_hi - s0)
        amps = pipe.parse_window(data, index, s0, c)  # (3, c, B, 64) i16
        a = np.zeros((3, w8, hdr.blocks_per_plane, 64), np.int16)
        a[:, :c] = np.asarray(amps)
        seg = np.zeros(w8, bool)
        seg[:c] = index.is_iframe[s0:s0 + c]
        wins.append((jnp.asarray(a), jnp.asarray(seg), c))

    fn = jax.jit(lambda a, g: transform_jax.decode_transform(
        a[0], a[1], a[2], g, blocks_h=hdr.blocks_h, blocks_w=hdr.blocks_w))

    def run():
        got = 0
        checksum = 0
        for a, g, c in wins:
            out = fn(a, g)
            got += c
            checksum ^= int(out[0, 0, 0])  # fence the window
        return got, checksum
else:
    def run():
        got = 0
        checksum = 0
        for win in pipe.decode(data, start_frame=part.frame_lo,
                               end_frame=part.frame_hi):
            got += win.count
            checksum ^= int(win.frames[0][0, 0])  # touch the delivery
        return got, checksum


run()  # warm: compile + one pass
# Barrier so every host's timed pass starts together (allgather round-trip).
multihost.aggregate_counts(0.0)
reps = 3 if os.environ.get("KERNEL_BOUND") == "1" else 1
wall = float("inf")
for _ in range(reps):
    t0 = time.perf_counter()
    got, checksum = run()
    wall = min(wall, time.perf_counter() - t0)

total_frames = multihost.aggregate_counts(float(got))
from jax.experimental import multihost_utils
import jax.numpy as jnp

walls = np.asarray(multihost_utils.process_allgather(jnp.float32(wall))) \
    if n > 1 else np.array([wall], np.float32)
counts = np.asarray(multihost_utils.process_allgather(jnp.float32(got))) \
    if n > 1 else np.array([got], np.float32)

# Aggregate rate: every host's frames over the SLOWEST host's wall (the
# batch finishes when the last partition does).
agg_fps = float(total_frames) / float(walls.max())
if pid == 0:
    out = {
        "hosts": n,
        "devices_per_host": int(os.environ["DEVS_PER_HOST"]),
        "frames_total": int(total_frames),
        "aggregate_frames_per_s": round(agg_fps, 1),
        "wall_max_s": round(float(walls.max()), 4),
        "per_host": [
            {"host": h, "frames": int(counts[h]), "wall_s": round(float(walls[h]), 4),
             "frames_per_s": round(float(counts[h]) / max(float(walls[h]), 1e-9), 1)}
            for h in range(n)
        ],
    }
    with open(os.environ["OUT"], "w") as f:
        json.dump(out, f)
print("WORKER_OK", pid, got, flush=True)
"""


def _launch(n_hosts: int, devs_per_host: int, stream: str, out: str,
            port: int, kernel_bound: bool = False,
            fixed_slice: int | None = None) -> dict:
    # All "hosts" share this one box: pin each to a fair core slice so the
    # artifact measures partition accounting, not core oversubscription
    # (real hosts do not share cores).  Default mode: the 1-host pass gets
    # every core — scaling_efficiency embeds the shared-box penalty and
    # the JSON note says so.  fixed_slice (kernel-bound row): EVERY run
    # pins each host to `fixed_slice` cores, so the 1-host and N-host
    # passes compare equal hosts and efficiency measures scaling, not
    # oversubscription.
    omp = fixed_slice or max(1, (os.cpu_count() or 4) // n_hosts)
    with tempfile.TemporaryDirectory() as td:
        worker = os.path.join(td, "worker.py")
        with open(worker, "w") as f:
            f.write(_WORKER)
        procs = []
        for pid in range(n_hosts):
            env = dict(os.environ)
            env.update(
                REPO_ROOT=str(REPO),
                COORD=f"localhost:{port}",
                NPROCS=str(n_hosts),
                PID=str(pid),
                STREAM=stream,
                OUT=out,
                DEVS_PER_HOST=str(devs_per_host),
                JAX_PLATFORMS="cpu",
                OMP_NUM_THREADS=str(omp),
            )
            if kernel_bound:
                env["KERNEL_BOUND"] = "1"
            if fixed_slice:
                env["PIN_LO"] = str(pid * fixed_slice)
                env["PIN_HI"] = str((pid + 1) * fixed_slice)
            env.pop("XLA_FLAGS", None)
            procs.append(subprocess.Popen(
                [sys.executable, worker], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        for p in procs:
            stdout, stderr = p.communicate(timeout=600)
            if p.returncode != 0 or "WORKER_OK" not in stdout:
                raise RuntimeError(
                    f"worker failed (rc={p.returncode}):\n{stderr[-3000:]}"
                )
    with open(out) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--devices-per-host", type=int, default=2)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--gop", type=int, default=8)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=272)
    ap.add_argument("--out", default=None,
                    help="write the full JSON artifact here (default: "
                         "stdout only)")
    ap.add_argument("--port", type=int, default=12431)
    ap.add_argument("--kb-hosts", default="2,4",
                    help="comma-separated host counts for the kernel-bound "
                         "scaling CURVE (VERDICT r4 next#4: one point is "
                         "not a curve); each N pins every host to "
                         "cpu_count//N cores in both the 1-host and "
                         "N-host runs")
    ap.add_argument("--kb-reps", type=int, default=3,
                    help="repeat each kernel-bound (1-host, N-host) pair "
                         "this many times and report the MEDIAN efficiency "
                         "with all samples — the two launches sit minutes "
                         "apart on a shared box, so a single pair carries "
                         "the hour's drift (observed 0.77-0.83 on "
                         "identical code)")
    args = ap.parse_args()

    # Build the corpus with the host encoder (one unique GOP replicated:
    # decode cost is per copy).
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, str(REPO))
    import numpy as np

    from mjpeg423_tpu.core.format import Frame, serialize_file, index_frames
    from mjpeg423_tpu.native import centropy

    rng = np.random.default_rng(423)
    b = (args.height // 8) * (args.width // 8)
    amps = np.zeros((3, args.gop, b, 64), dtype=np.int16)
    amps[..., :8] = rng.integers(-64, 64, size=(3, args.gop, b, 8))
    hi = rng.integers(-8, 8, size=(3, args.gop, b, 56))
    amps[..., 8:] = np.where(
        rng.random((3, args.gop, b, 56)) < 0.15, hi, 0
    ).astype(np.int16)
    frames = []
    for fi in range(args.gop):
        planes = [centropy.encode_plane(amps[p, fi]) for p in range(3)]
        frames.append(Frame(0 if fi == 0 else 1, *planes))
    reps = max(1, args.frames // args.gop)
    data = serialize_file(args.width, args.height, frames * reps)
    nf = args.gop * reps
    index = index_frames(data)

    with tempfile.TemporaryDirectory() as td:
        stream = os.path.join(td, "bench.mpg")
        with open(stream, "wb") as f:
            f.write(data)

        print(f"corpus: {len(data) / 1e6:.1f} MB, {nf} frames "
              f"@ {args.width}x{args.height}, {len(index.gop_starts())} GOPs",
              file=sys.stderr)
        r1 = _launch(1, args.devices_per_host, stream,
                     os.path.join(td, "r1.json"), args.port)
        print(f"1 host: {r1['aggregate_frames_per_s']} frames/s",
              file=sys.stderr)
        rn = _launch(args.hosts, args.devices_per_host, stream,
                     os.path.join(td, "rn.json"), args.port + 1)
        print(f"{args.hosts} hosts: {rn['aggregate_frames_per_s']} frames/s "
              f"aggregate", file=sys.stderr)

    # Kernel-bound rows: pre-parsed amplitudes + fixed equal core slices
    # per host in both runs (see _launch).  This is the configuration in
    # which the virtual mesh CAN demonstrate real scaling: partitions
    # share nothing, hosts have identical resources.  Measured at EVERY
    # host count in --kb-hosts so the artifact carries a curve, not a
    # single point (VERDICT r4 next#4).
    kb_hosts = sorted({int(x) for x in args.kb_hosts.split(",") if x})
    kb_curve = []
    port = args.port + 2
    for n_kb in kb_hosts:
        slice_c = max(1, (os.cpu_count() or 4) // n_kb)
        samples = []
        kb1 = kbn = None
        for rep in range(max(1, args.kb_reps)):
            with tempfile.TemporaryDirectory() as td:
                stream = os.path.join(td, "bench.mpg")
                with open(stream, "wb") as f:
                    f.write(data)
                kb1 = _launch(1, args.devices_per_host, stream,
                              os.path.join(td, "kb1.json"), port,
                              kernel_bound=True, fixed_slice=slice_c)
                kbn = _launch(n_kb, args.devices_per_host, stream,
                              os.path.join(td, "kbn.json"), port + 1,
                              kernel_bound=True, fixed_slice=slice_c)
                port += 2
            eff = (kbn["aggregate_frames_per_s"]
                   / (kb1["aggregate_frames_per_s"] * n_kb))
            samples.append(round(eff, 3))
            print(f"kernel-bound N={n_kb} rep {rep}: 1-host "
                  f"{kb1['aggregate_frames_per_s']} -> {n_kb}-host "
                  f"{kbn['aggregate_frames_per_s']} frames/s "
                  f"(eff {eff:.3f})", file=sys.stderr)
        med = sorted(samples)[len(samples) // 2]
        kb_curve.append({
            "one_host": kb1,
            "n_hosts": kbn,
            "hosts": n_kb,
            "scaling_efficiency": med,
            "efficiency_samples": samples,
            "cores_per_host": slice_c,
            "note": ("pre-parsed amplitudes, each host pinned to its own "
                     f"{slice_c}-core slice in BOTH runs — equal hosts, "
                     "disjoint resources: the configuration whose "
                     "efficiency measures the sharded decode path itself; "
                     "median of all samples, every sample reported"),
        })

    eff = (rn["aggregate_frames_per_s"]
           / (r1["aggregate_frames_per_s"] * args.hosts))
    result = {
        "metric": "multihost_aggregate_decode",
        "geometry": f"{args.width}x{args.height}",
        "frames": nf,
        "one_host": r1,
        "n_hosts": rn,
        "scaling_efficiency": round(eff, 3),
        # On ONE box the N hosts split the same cores, so the ideal
        # N-host aggregate EQUALS the 1-host number (ratio 1.0) for
        # parse-bound work — this ratio isolates the partition/DCN
        # overhead, which is what the virtual mesh CAN measure honestly.
        "shared_box_throughput_ratio": round(
            rn["aggregate_frames_per_s"] / r1["aggregate_frames_per_s"], 3),
        # Back-compat single block (the --hosts point if measured, else
        # the first curve point) + the full curve.
        "kernel_bound": next(
            (e for e in kb_curve if e["hosts"] == args.hosts),
            kb_curve[0] if kb_curve else None),
        "kernel_bound_curve": [
            {k: e[k] for k in
             ("hosts", "cores_per_host", "scaling_efficiency")}
            | {"aggregate_frames_per_s":
               e["n_hosts"]["aggregate_frames_per_s"],
               "one_host_frames_per_s":
               e["one_host"]["aggregate_frames_per_s"]}
            for e in kb_curve
        ],
        "note": ("virtual CPU mesh on one box: N processes share the same "
                 f"{os.cpu_count()}-core host, so parse-bound efficiency "
                 "understates real N-box scaling (GOP partitions share "
                 "nothing; see parallel/multihost.py); the kernel_bound "
                 "block isolates the decode path with equal per-host "
                 "resources"),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
