"""Checkpoint/resume + lineage + skew-salting tests."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def sample_ds(ray_session):
    import ray.data

    pdf = pd.DataFrame(
        {
            "cell": np.repeat([f"c{i}" for i in range(8)], 50),
            "val": np.arange(400, dtype=np.int64),
        }
    )
    return ray.data.from_pandas(pdf), pdf


class TestCheckpoint:
    def test_write_then_resume(self, sample_ds, tmp_path):
        from stac_catalog_builder_ray.state.checkpoint import (
            CheckpointStore,
            checkpointed_write,
            read_checkpointed,
        )

        ds, pdf = sample_ds
        root = str(tmp_path / "ckpt")
        s1 = checkpointed_write(ds, root, "cell")
        assert len(s1) == 8 and not s1["skipped"].any()
        store = CheckpointStore(root)
        assert store.finished() == {f"c{i}" for i in range(8)}

        # lineage records carry per-partition metrics
        lin = store.lineage("c0")
        assert lin["rows"] == 50 and lin["bytes"] > 0 and "wall_sec" in lin
        mf = store.metrics_frame()
        assert mf["rows"].sum() == 400

        # a rerun ("killed job restart") must write nothing new
        mtimes = {p: os.path.getmtime(os.path.join(root, f"part={p}", "data.parquet")) for p in store.finished()}
        s2 = checkpointed_write(ds, root, "cell")
        assert len(s2) == 0  # finished partitions filtered before the shuffle
        for p, mt in mtimes.items():
            assert os.path.getmtime(os.path.join(root, f"part={p}", "data.parquet")) == mt

        back = read_checkpointed(root).to_pandas()
        assert len(back) == 400
        assert set(back["cell"].unique()) == {f"c{i}" for i in range(8)}

    def test_partial_resume(self, sample_ds, tmp_path):
        """Simulate a killed run: half the partitions finished; resume writes
        only the rest."""
        from stac_catalog_builder_ray.state.checkpoint import (
            CheckpointStore,
            checkpointed_write,
        )
        import ray.data

        ds, pdf = sample_ds
        root = str(tmp_path / "ckpt2")
        half = ray.data.from_pandas(pdf[pdf["cell"].isin([f"c{i}" for i in range(4)])])
        s1 = checkpointed_write(half, root, "cell")
        assert len(s1) == 4

        s2 = checkpointed_write(ds, root, "cell")
        assert sorted(s2["partition"]) == [f"c{i}" for i in range(4, 8)]
        assert CheckpointStore(root).finished() == {f"c{i}" for i in range(8)}


class TestSaltedCheckpointWrite:
    def test_hot_cell_bounded_and_resumable(self, ray_session, tmp_path):
        """100x hot cell through the salted checkpointed sink: per-partition
        rows stay bounded, nothing is lost, and a rerun writes zero new
        partitions (content-hash salts are run-stable)."""
        import ray.data

        from stac_catalog_builder_ray.state.checkpoint import (
            CheckpointStore, checkpointed_write, read_checkpointed)

        cells = ["hot"] * 1000 + [f"cold{i // 10}" for i in range(200)]
        pdf = pd.DataFrame({
            "cell": cells,
            "id": [f"row-{i}" for i in range(len(cells))],
        })
        ds = ray.data.from_pandas(pdf).repartition(8)
        root = str(tmp_path / "salted")
        s1 = checkpointed_write(ds, root, "cell", salt_hot_threshold=50,
                                salt_id_col="id")
        assert not s1["skipped"].any()
        store = CheckpointStore(root)
        mf = store.metrics_frame()
        assert mf["rows"].sum() == len(pdf)
        # hot fanout = min(32, ceil(1000/50)) = 20 -> ~50 rows/sub-partition;
        # 3x slack covers siphash variance
        hot_parts = mf[mf["partition"].str.startswith("hot#")]
        assert len(hot_parts) == 20
        assert hot_parts["rows"].max() <= 150
        assert hot_parts["rows"].sum() == 1000
        # cold cells: single #0 sub-partition each
        cold = mf[~mf["partition"].str.startswith("hot#")]
        assert set(cold["partition"]) == {f"cold{i}#0" for i in range(20)}

        # rerun = killed-job restart: zero new writes (salts are stable)
        s2 = checkpointed_write(ds, root, "cell", salt_hot_threshold=50,
                                salt_id_col="id")
        assert len(s2) == 0

        back = read_checkpointed(root).to_pandas()
        assert sorted(back["id"]) == sorted(pdf["id"])  # exactly-once
        assert "_salted_pid" not in back.columns  # helper col not persisted

    def test_threshold_requires_id_col(self, ray_session, tmp_path):
        import ray.data

        from stac_catalog_builder_ray.state.checkpoint import checkpointed_write

        ds = ray.data.from_pandas(pd.DataFrame({"cell": ["a"], "id": ["x"]}))
        with pytest.raises(ValueError, match="salt_id_col"):
            checkpointed_write(ds, str(tmp_path / "x"), "cell",
                               salt_hot_threshold=10)


class TestSkew:
    def test_detect_and_salt(self, ray_session):
        import ray.data
        from ray.data.aggregate import Count

        from stac_catalog_builder_ray.state.skew import add_salted_key, detect_hot_keys

        pdf = pd.DataFrame(
            {"cell": ["hot"] * 900 + [f"cold{i}" for i in range(100)], "v": np.arange(1000)}
        )
        ds = ray.data.from_pandas(pdf)
        hot = detect_hot_keys(ds, "cell", threshold=200)
        assert set(hot) == {"hot"}
        assert 2 <= hot["hot"] <= 32

        salted = add_salted_key(ds, "cell", hot)
        counts = salted.groupby("salted_key").aggregate(Count(alias_name="n")).to_pandas()
        hot_parts = counts[counts["salted_key"].str.startswith("hot#")]
        assert len(hot_parts) == hot["hot"]  # hot key spread over its fanout
        assert hot_parts["n"].sum() == 900
        assert hot_parts["n"].max() < 900  # no single reducer gets it all
        cold = counts[counts["salted_key"].str.startswith("cold")]
        assert (cold["n"] == 1).all()


class TestCompaction:
    def test_round_trip_and_resume(self, ray_session, tmp_path):
        import glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        from stac_catalog_builder_ray.state.checkpoint import compact_parts

        src = tmp_path / "small"
        src.mkdir()
        rng = np.random.default_rng(5)
        all_ids = []
        for k in range(20):  # 20 small parts x 500 rows
            ids = np.arange(k * 500, k * 500 + 500, dtype=np.int64)
            all_ids.append(ids)
            pq.write_table(pa.table({"id": pa.array(ids),
                                     "v": pa.array(rng.normal(size=500))}),
                           str(src / f"part-{k:05d}.parquet"))
        out = tmp_path / "compacted"
        summary = compact_parts(str(src), str(out), target_rows=4000)
        files = glob.glob(str(out / "part-*.parquet"))
        assert 2 <= len(files) <= 4  # 10k rows / 4k target -> 3 parts
        got = pq.read_table(files)
        assert got.num_rows == 10_000
        assert sorted(got["id"].to_pylist()) == sorted(np.concatenate(all_ids).tolist())
        # source untouched
        assert len(glob.glob(str(src / "*.parquet"))) == 20
        # resume: second run skips finished parts (no rewrites, same files)
        before = {f: os.path.getmtime(f) for f in files}
        compact_parts(str(src), str(out), target_rows=4000)
        after = {f: os.path.getmtime(f) for f in glob.glob(str(out / "part-*.parquet"))}
        assert before == after


class TestSortedPartitionedWrite:
    def test_global_order_and_resume(self, ray_session, tmp_path):
        import glob
        import json
        import shutil

        import pyarrow.parquet as pq
        import ray.data

        from stac_catalog_builder_ray.state.checkpoint import (
            CheckpointStore, write_sorted_partitioned)

        root = str(tmp_path / "sorted")
        ds = ray.data.read_parquet("/root/testdata/sf0.001/orders.parquet",
                                   columns=["o_orderkey", "o_totalprice"])
        summary = write_sorted_partitioned(ds, root, key="o_totalprice",
                                           num_partitions=8)
        assert not summary["skipped"].any()
        parts = sorted(glob.glob(os.path.join(root, "part=*", "data.parquet")))
        assert len(parts) >= 2
        # concatenation in pid order is GLOBALLY sorted and complete
        frames = [pq.read_table(p).to_pandas() for p in parts]
        allv = np.concatenate([f["o_totalprice"].to_numpy() for f in frames])
        assert (np.diff(allv) >= 0).all()
        src = pq.read_table("/root/testdata/sf0.001/orders.parquet")
        assert len(allv) == src.num_rows
        assert np.allclose(np.sort(src["o_totalprice"].to_numpy()), allv)
        # manifest key ranges are disjoint and ordered
        st = CheckpointStore(root)
        mf = st.metrics_frame().sort_values("partition")
        assert (mf["key_min"].to_numpy()[1:] >= mf["key_max"].to_numpy()[:-1]).all()

        # resume: nuke ONE part (+ its lineage) -> only that part rewrites,
        # splits.json is reused so ranges are identical
        with open(os.path.join(root, "splits.json")) as f:
            splits_before = json.load(f)
        victim = mf["partition"].iloc[3]
        shutil.rmtree(os.path.join(root, f"part={victim}"))
        os.remove(st._pid_path(victim))
        summary2 = write_sorted_partitioned(ds, root, key="o_totalprice",
                                            num_partitions=8)
        by_pid = summary2.set_index("partition")["skipped"]
        assert not by_pid.loc[victim]
        assert by_pid.drop(victim).all()
        with open(os.path.join(root, "splits.json")) as f:
            assert json.load(f) == splits_before
        rewritten = pq.read_table(os.path.join(root, f"part={victim}", "data.parquet"))
        assert rewritten.num_rows == mf.set_index("partition").loc[victim, "rows"]


class TestPackImageShards:
    def test_budget_order_and_resume(self, ray_session, tmp_path):
        import glob
        import shutil

        import numpy as np
        import pyarrow.parquet as pq
        import ray.data

        from stac_catalog_builder_ray.pipelines.spatial_catalog import (
            images_from_documents,
        )
        from stac_catalog_builder_ray.state.checkpoint import (CheckpointStore,
                                                               pack_image_shards)

        src = images_from_documents("/root/testdata/sf0.001",
                                    "/tmp/scbr-query-cache")
        ds = ray.data.read_parquet(src)
        root = str(tmp_path / "shards")
        budget = 512 * 1024
        summary = pack_image_shards(ds, root, budget_bytes=budget)
        assert not summary["skipped"].any()
        parts = sorted(glob.glob(os.path.join(root, "shard=*", "data.parquet")))
        assert len(parts) >= 3

        frames = [pq.read_table(p) for p in parts]
        # completeness: every source row lands exactly once
        n_src = sum(pq.ParquetFile(f).metadata.num_rows
                    for f in glob.glob(src + "/*.parquet"))
        assert sum(f.num_rows for f in frames) == n_src
        # global id order across shard concatenation
        all_ids = [i for f in frames for i in f["image_id"].to_pylist()]
        assert all_ids == sorted(all_ids)
        # budget rule: an image starts a new shard only once the budget is
        # consumed -> every shard except the last starts before its
        # boundary and total bytes-before of its first row == shard*budget
        # floor rule; simpler invariant: every shard's byte size is within
        # budget + one max image of the budget
        max_img = max(len(b) for f in frames for b in f["bytes"].to_pylist())
        for f in frames[:-1]:
            size = sum(len(b) for b in f["bytes"].to_pylist())
            assert size <= budget + max_img

        # resume: nuke one shard -> only it rewrites, ids identical
        st = CheckpointStore(root)
        victim = "00002"
        before_ids = pq.read_table(
            os.path.join(root, f"shard={victim}", "data.parquet"))["image_id"].to_pylist()
        shutil.rmtree(os.path.join(root, f"shard={victim}"))
        os.remove(st._pid_path(victim))
        summary2 = pack_image_shards(ds, root, budget_bytes=budget)
        by = summary2.set_index("shard")["skipped"]
        assert not by.loc[victim] and by.drop(victim).all()
        after_ids = pq.read_table(
            os.path.join(root, f"shard={victim}", "data.parquet"))["image_id"].to_pylist()
        assert after_ids == before_ids
