"""Per-stage decomposition of the flagship's 8->32 scaling residual
(round-4 directive #2).

The flagship (`index_and_join_fused`) is three stages: the read-chained
DECODE map, the ITEM-ASSEMBLY coalesce+map, and the PARTIAL-AGG tail.
This tool times cumulative PREFIXES of that pipeline (decode only;
decode->items; full) in FRESH processes at several cpu levels — including
num_cpus=30 vs 32, which isolates the "full-box system tax" (raylet, GCS,
driver and the OS contending with 32 busy workers): if 30 ≈ 32, two spare
hardware threads buy nothing and the residual is DRAM bandwidth; if 30
beats 32 materially, the tax is scheduler/system CPU contention and the
recorded stage deltas name where it lands.

Per-stage wall = prefix-wall delta at each level.  Probe-gated like
bench.py (no-Ray decode+phash probe at the level's concurrency before and
after each child, host factors published) so a reader can reject
noise-tilted readings.

Usage:
  python tools/stage_tax.py                  # parent: full sweep, one JSON
  python tools/stage_tax.py --child 32 items # child: one prefix, one level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PREFIXES = ("decode", "items", "full")
LEVELS = (8, 30, 32)
CHILD_REPS = 2  # min-of-2 inside one warm worker pool (bench's protocol)


def run_child(cpus: int, prefix: str) -> None:
    import ray

    import bench

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    images = bench.prepare_images(bench.SF_DIR)

    # same warmups as bench.run_bench: page cache + worker-pool imports
    import glob as _glob

    import pyarrow.parquet as pq

    for f in _glob.glob(os.path.join(images, "*.parquet")):
        pq.read_table(f)
    import ray.data as _rd

    def _warm(b):
        import stac_catalog_builder_ray.stages.assemble  # noqa: F401
        import stac_catalog_builder_ray.stages.extract  # noqa: F401

        return b

    _rd.range(cpus * 4, override_num_blocks=cpus * 4).map_batches(
        _warm, batch_size=1).count()

    ctx.op_resource_reservation_enabled = False  # flagship protocol

    from stac_catalog_builder_ray.config import tiled_collection_config
    from stac_catalog_builder_ray.pipelines.catalog import (
        asset_metadata_dataset)
    from stac_catalog_builder_ray.pipelines.spatial_catalog import (
        index_and_join_fused)
    from stac_catalog_builder_ray.stages.assemble import items_dataset

    config = tiled_collection_config()
    assembly_blocks = max(16, cpus)

    def run_prefix() -> None:
        md = asset_metadata_dataset(images, config, batch_size=512,
                                    verify_phash=True, fused=True)
        if prefix == "decode":
            md.count()
        elif prefix == "items":
            items_dataset(md, frozenset(config.item_assets),
                          coalesce_blocks=assembly_blocks).count()
        else:
            index_and_join_fused(images)

    walls = []
    for _ in range(CHILD_REPS):
        t0 = time.monotonic()
        run_prefix()
        walls.append(round(time.monotonic() - t0, 3))
    ray.shutdown()
    print(json.dumps({"cpus": cpus, "prefix": prefix, "walls": walls,
                      "wall": min(walls)}))


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        run_child(int(sys.argv[2]), sys.argv[3])
        return

    import bench

    out = {"metric": "flagship per-stage walls by cpu level (sec)",
           "sf_dir": bench.SF_DIR, "levels": {}, "idle_ref":
           {str(k): v for k, v in bench.PROBE_IDLE_REF.items()}}
    for cpus in LEVELS:
        probe_level = min(cpus, 32)
        pre = bench.probe_task_sec(probe_level)
        cells = {}
        for prefix in PREFIXES:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(cpus), prefix],
                capture_output=True, text=True)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")][-1]
            cells[prefix] = json.loads(line)
        post = bench.probe_task_sec(probe_level)
        ref = bench.PROBE_IDLE_REF.get(probe_level,
                                       bench.PROBE_IDLE_REF[32])
        d, i, f = (cells["decode"]["wall"], cells["items"]["wall"],
                   cells["full"]["wall"])
        out["levels"][str(cpus)] = {
            "decode": d, "items": i, "full": f,
            "stage_decode": d,
            "stage_assembly": round(i - d, 3),
            "stage_aggtail": round(f - i, 3),
            "walls": {p: cells[p]["walls"] for p in PREFIXES},
            "probe_pre_host_factor": round(pre / ref, 3),
            "probe_post_host_factor": round(post / ref, 3),
        }
        print(json.dumps({"level_done": cpus,
                          **out["levels"][str(cpus)]}), file=sys.stderr)
    lv = out["levels"]
    if "8" in lv and "32" in lv:
        out["raw_8_to_32_efficiency"] = round(
            (lv["8"]["full"] / lv["32"]["full"]) / 4.0, 3)
    if "30" in lv and "32" in lv:
        out["full_30_over_32"] = round(lv["32"]["full"] / lv["30"]["full"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
