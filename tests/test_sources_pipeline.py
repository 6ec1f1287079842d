"""Tests for sources/sinks and the pipeline registry."""

from __future__ import annotations

import io
import os
import tempfile

import pytest
from pyspark.sql import functions as F


class TestHttpFetch:
    def test_fetch_file_urls_distributed(self, spark, tmp_path):
        files = []
        for i in range(3):
            p = tmp_path / f"f{i}.txt"
            p.write_text(f"payload-{i}")
            files.append(f"file://{p}")
        from gov_data_pipeline_spark.sources import fetch_urls

        urls = spark.createDataFrame([(u,) for u in files], "url string")
        out = {r["url"]: r for r in fetch_urls(urls, max_retries=1).collect()}
        assert len(out) == 3
        for i, u in enumerate(files):
            assert out[u]["content"] == f"payload-{i}".encode()

    def test_fetch_failure_yields_status_minus_one(self, spark):
        from gov_data_pipeline_spark.sources import fetch_urls

        urls = spark.createDataFrame([("file:///does/not/exist",)], "url string")
        r = fetch_urls(urls, max_retries=2, retry_delay=0.01).collect()[0]
        assert r["status"] == -1 and r["content"] is None


class TestFtpSink:
    class FakeFTP:
        """Models real FTP directory state: cwd is RELATIVE to the
        current directory (the bug class the segment-wise _mkdirs
        exists for), stores record the absolute path."""

        def __init__(self, fail_connects: int, store: dict):
            self.fail_connects = fail_connects
            self.store = store
            self.cwd_path: list[str] = []

        def connect(self, host, port, timeout):
            if self.store.setdefault("__attempts", 0) < self.fail_connects:
                self.store["__attempts"] += 1
                raise OSError("connect failed")

        def login(self, user, password):
            pass

        def _abs(self, d: str) -> str:
            return "/".join(self.cwd_path + [d])

        def cwd(self, d):
            if "/" in d:
                raise OSError("multi-segment cwd unsupported by fake")
            if self._abs(d) not in self.store.setdefault("__dirs", set()):
                raise OSError("no such dir")
            self.cwd_path.append(d)

        def mkd(self, d):
            self.store.setdefault("__dirs", set()).add(self._abs(d))

        def storbinary(self, cmd, buf):
            name = cmd.split(" ", 1)[1]
            self.store["/".join(self.cwd_path + [name])] = buf.read()

        def quit(self):
            pass

    def test_retry_reconnect_and_nested_mkdirs(self):
        from gov_data_pipeline_spark.sources import FTPSink

        store: dict = {}
        sink = FTPSink(
            "host",
            user="u",
            password="p",
            remote_dir="a/b",
            ftp_factory=lambda: self.FakeFTP(1, store),
            sleep=lambda d: None,
        )
        sink.upload_bytes(b"bytes!", "out.xlsx")
        assert store["__attempts"] == 1  # one failed connect, then success
        assert store["a/b/out.xlsx"] == b"bytes!"
        # second upload over the same (now-existing) tree
        sink._ftp.cwd_path = []  # simulate a fresh session position
        sink.upload_bytes(b"more", "out2.xlsx")
        assert store["a/b/out2.xlsx"] == b"more"

    def test_transfer_failure_reconnects_once(self):
        from gov_data_pipeline_spark.sources import FTPSink

        store: dict = {}
        made: list = []

        class DropFirstStore(self.FakeFTP):
            def storbinary(self, cmd, buf):
                if store.setdefault("__drops", 0) < 1:
                    store["__drops"] += 1
                    raise OSError("connection lost")
                super().storbinary(cmd, buf)

        def factory():
            f = DropFirstStore(0, store)
            made.append(f)
            return f

        sink = FTPSink(
            "host", user="u", password="p", remote_dir="d",
            ftp_factory=factory, sleep=lambda d: None,
        )
        sink.upload_bytes(b"x", "f.bin")
        assert len(made) == 2  # dead session dropped, fresh one retried
        assert store["d/f.bin"] == b"x"


class TestExcel:
    def test_roundtrip_or_gated(self, spark):
        from gov_data_pipeline_spark.sources import read_excel, write_excel

        df = spark.createDataFrame([("x", "1"), ("y", "2")], "a string, b string")
        buf = io.BytesIO()
        try:
            write_excel(df, buf)
        except NotImplementedError:
            pytest.skip("no Excel engine in runtime (gated as designed)")
        buf.seek(0)
        back = read_excel(spark, buf.getvalue(), skip_rows=0)
        rows = back.orderBy("row_idx").collect()
        assert rows[0]["c0"] == "a" and rows[1]["c0"] == "x"  # header row + data


class TestMultimodal:
    def test_schema_and_batchwise_decode(self, spark):
        from gov_data_pipeline_spark.sources.multimodal import (
            decode_media_features,
            pack_media_col,
        )

        df = spark.createDataFrame([(1, "hello"), (2, None)], "id long, txt string")
        packed = df.select(
            "id",
            F.when(
                F.col("txt").isNotNull(),
                pack_media_col(F.encode("txt", "UTF-8"), "image/png"),
            ).alias("media"),
        )
        out = decode_media_features(packed, "media").collect()
        byid = {r["id"]: r["media_features"] for r in out}
        assert byid[1]["n_bytes"] == 5
        assert len(byid[1]["sha256"]) == 64
        assert len(byid[1]["features"]) == 8
        assert byid[2] is None

    def test_frame_sample_is_stubbed(self, spark):
        from gov_data_pipeline_spark.sources.multimodal import frame_sample

        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(NotImplementedError):
            frame_sample(df, "media")

    def test_resize_stamps_geometry_and_keeps_schema(self, spark):
        from gov_data_pipeline_spark.sources.multimodal import (
            pack_media_col,
            resize_media,
        )

        df = spark.createDataFrame([(1, "hello"), (2, None)], "id long, txt string")
        packed = df.select(
            "id",
            F.when(
                F.col("txt").isNotNull(),
                pack_media_col(F.encode("txt", "UTF-8"), "image/png"),
            ).alias("media"),
        )
        out = resize_media(packed, "media", 224, 224)
        assert out.schema["media"].dataType.fieldNames() == ["mime", "data", "meta"]
        rows = {r["id"]: r["media"] for r in out.collect()}
        assert rows[1]["meta"]["width"] == "224"
        assert rows[1]["meta"]["height"] == "224"
        assert rows[1]["mime"] == "image/png"
        assert rows[2] is None
        # stub mode passes payload through untouched
        assert bytes(rows[1]["data"]) == b"hello"

    def test_resize_preserves_null_payload(self, spark):
        """A media struct with a null payload (failed fetch) must keep
        data null — not become empty bytes that a decoder would choke
        on."""
        from gov_data_pipeline_spark.sources.multimodal import resize_media

        df = spark.createDataFrame([(1,)], "id long").select(
            "id",
            F.struct(
                F.lit("image/png").alias("mime"),
                F.lit(None).cast("binary").alias("data"),
                F.create_map().cast("map<string,string>").alias("meta"),
            ).alias("media"),
        )
        row = resize_media(df, "media", 64, 64).collect()[0]["media"]
        assert row["data"] is None
        assert row["meta"]["width"] == "64"


class TestPipelineRegistry:
    def test_process_all_isolation_and_config(self, spark):
        from gov_data_pipeline_spark.pipeline import (
            Pipeline,
            PipelineConfig,
            PipelineRegistry,
        )

        reg = PipelineRegistry()
        reg.register(
            Pipeline(
                "good",
                source=lambda sp, cfg: sp.range(3).withColumn(
                    "tag", F.lit(cfg.options.get("tag", ""))
                ),
                transforms=[lambda df: df.filter(F.col("id") > 0)],
            )
        )
        reg.register(
            Pipeline("bad", source=lambda sp, cfg: (_ for _ in ()).throw(RuntimeError()))
        )
        reg.register(Pipeline("off", source=lambda sp, cfg: sp.range(1)))

        results = reg.process_all(
            spark,
            {
                "good": PipelineConfig("good", options={"tag": "T"}),
                "off": PipelineConfig("off", enabled=False),
            },
        )
        assert set(results) == {"good", "bad"}
        assert results["bad"] is None
        rows = results["good"].collect()
        assert len(rows) == 2 and rows[0]["tag"] == "T"


class TestDocumentIngestGating:
    def test_codec_gated_functions_raise_clearly(self):
        from gov_data_pipeline_spark.sources.documents import (
            docx_tables,
            extract_xlsx_images,
            pdf_tables,
        )

        for fn, arg in [
            (docx_tables, b""),
            (pdf_tables, b""),
        ]:
            with pytest.raises(NotImplementedError):
                fn(arg)
        with pytest.raises(NotImplementedError):
            extract_xlsx_images(b"", "belarus")


class TestFileFormats:
    """T1 beyond parquet: CSV and JSON scans round-trip typed data with
    explicit schemas (inference is opt-in only)."""

    def test_csv_roundtrip_explicit_schema(self, spark, sf_dir, tmp_path):
        from gov_data_pipeline_spark.catalog import read_table
        from gov_data_pipeline_spark.sources.files import read_csv

        nation = read_table(spark, sf_dir, "nation")
        path = str(tmp_path / "nation_csv")
        nation.coalesce(1).write.option("header", "true").csv(path)
        back = read_csv(
            spark,
            path,
            schema="n_nationkey bigint, n_name string, n_regionkey bigint",
        )
        assert sorted(back.collect()) == sorted(
            nation.select("n_nationkey", "n_name", "n_regionkey").collect()
        )

    def test_json_roundtrip_and_schema_pruning(self, spark, sf_dir, tmp_path):
        from gov_data_pipeline_spark.catalog import read_table
        from gov_data_pipeline_spark.sources.files import read_json

        region = read_table(spark, sf_dir, "region")
        path = str(tmp_path / "region_json")
        region.coalesce(1).write.json(path)
        back = read_json(spark, path, schema="r_regionkey bigint, r_name string")
        assert sorted(back.collect()) == sorted(
            region.select("r_regionkey", "r_name").collect()
        )


class TestOrcAndText:
    def test_orc_round_trip_preserves_values(self, spark, tmp_path):
        from gov_data_pipeline_spark.sources.files import read_orc, write_orc

        df = spark.createDataFrame(
            [(1, "alpha", 1.5), (2, "beta", -2.25)], "id long, s string, x double"
        )
        path = str(tmp_path / "t.orc")
        write_orc(df, path)
        back = read_orc(spark, path)
        assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}

    def test_orc_partitioned_layout_prunes(self, spark, tmp_path):
        from gov_data_pipeline_spark.sources.files import read_orc, write_orc

        df = spark.createDataFrame(
            [(i, "a" if i % 2 else "b") for i in range(10)], "id long, part string"
        )
        path = str(tmp_path / "p.orc")
        write_orc(df, path, partition_by=["part"])
        pruned = read_orc(spark, path).filter("part = 'a'")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert pruned.count() == 5
        # the predicate must appear INSIDE the scan's PartitionFilters
        # clause (post-scan Filter nodes would still mention part#)
        assert "PartitionFilters: [" in plan
        inside = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "part" in inside

    def test_text_lines(self, spark, tmp_path):
        from gov_data_pipeline_spark.sources.files import read_text

        f = tmp_path / "doc.txt"
        f.write_text("line one\nline two\n")
        rows = [r["value"] for r in read_text(spark, str(tmp_path)).collect()]
        assert sorted(rows) == ["line one", "line two"]
