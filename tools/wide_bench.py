"""Wide-payload regime benchmark (round-4 directive #6 evidence).

Repacks the cached 100k x 240x180 (~86 KB/row) wide image table into the
COARSE part layout that BASELINE.md measured as unstable (2048 rows/part ->
49 x ~143 MB parts = 1.5 task waves at 32 cpus, walls swinging 15-60 s),
then times the fused decode+extract pipeline over it:

- default parameters (read_images auto-applies the footer-driven
  wide-payload split from sources/partsize.py), and
- --no-auto (the old behavior: one fused task per coarse part).

Usage: python tools/wide_bench.py [--reps 3] [--no-auto] [--cpus 32]
Prints one JSON line per configuration.  Probe-gated like bench.py: a
no-Ray decode+phash contention probe brackets each timing so a reader can
reject host-noise-tilted readings.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FINE_DIR = "/tmp/scbr-bench/images-wide-100000-240x180"
COARSE_DIR = "/tmp/scbr-bench/images-wide-coarse-100000-240x180"
COARSE_ROWS_PER_PART = 2048


def build_coarse_copy() -> None:
    """Repack the fine-part wide table into 2048-row parts (atomic dir
    rename; streams one source part at a time, buffers <= ~180 MB)."""
    if os.path.isdir(COARSE_DIR):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    srcs = sorted(glob.glob(os.path.join(FINE_DIR, "*.parquet")))
    if not srcs:
        raise SystemExit(f"fine wide table missing: {FINE_DIR} "
                         "(run the bench wide experiment first)")
    tmp = COARSE_DIR + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    buf, nbuf, out_i = [], 0, 0

    def flush(final: bool) -> None:
        nonlocal buf, nbuf, out_i
        while nbuf >= COARSE_ROWS_PER_PART or (final and nbuf > 0):
            t = pa.concat_tables(buf)
            head = t.slice(0, COARSE_ROWS_PER_PART)
            rest = t.slice(COARSE_ROWS_PER_PART)
            pq.write_table(head, os.path.join(tmp, f"part-{out_i:05d}.parquet"),
                           row_group_size=512, compression="snappy")
            out_i += 1
            buf = [rest] if rest.num_rows else []
            nbuf = rest.num_rows

    for s in srcs:
        t = pq.read_table(s)
        buf.append(t)
        nbuf += t.num_rows
        flush(final=False)
    flush(final=True)
    os.replace(tmp, COARSE_DIR)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-auto", action="store_true",
                    help="disable the wide-payload auto split (old behavior)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fine", action="store_true",
                    help="time the FINE (196 x 512-row) reference layout")
    args = ap.parse_args()

    build_coarse_copy()

    import bench  # probe machinery + idle-ref sidecar

    import ray

    probe_pre = bench.probe_task_sec(4)
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from stac_catalog_builder_ray.pipelines.catalog import (
        asset_metadata_dataset)
    from stac_catalog_builder_ray.sources import images as _images
    from stac_catalog_builder_ray.sources.partsize import (
        wide_payload_num_blocks)

    if args.no_auto:  # old behavior: one fused task per coarse part
        orig = _images.read_images
        _images.read_images = (
            lambda path, columns=None, max_rows=None, auto_wide_split=True:
            orig(path, columns=columns, max_rows=max_rows,
                 auto_wide_split=False))

    data_dir = FINE_DIR if args.fine else COARSE_DIR
    parts = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    nb = wide_payload_num_blocks(parts)
    walls = []
    n_rows = 0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        n_rows = asset_metadata_dataset(data_dir, fused=True).count()
        walls.append(round(time.perf_counter() - t0, 2))
    probe_post = bench.probe_task_sec(4)
    ray.shutdown()
    idle4 = bench.PROBE_IDLE_REF[4]
    print(json.dumps({
        "metric": "wide-payload fused decode wall (sec)",
        "layout": (f"{len(parts)} x 512 rows/part (fine)" if args.fine
                   else f"{len(parts)} x ~{COARSE_ROWS_PER_PART} rows/part"),
        "auto_wide_split": not args.no_auto,
        "override_num_blocks": nb,
        "num_cpus": args.cpus,
        "n_rows": n_rows,
        "walls": walls,
        "probe_pre_host_factor": round(probe_pre / idle4, 3),
        "probe_post_host_factor": round(probe_post / idle4, 3),
    }))


if __name__ == "__main__":
    main()
