"""CLI round-trips: the `train` and `produce` commands that replace the
reference's start_training.sh / productiondata.sh, run in-process against
fixture data. (`pipeline` composes tested parts — pipeline tests cover it.)
"""

from __future__ import annotations

import json
import os
import random

import pytest

from spark_streaming_invoice_anomaly_detection_spark.__main__ import main


@pytest.fixture()
def training_csv(tmp_path):
    """development.csv-shaped training file: 40 invoices x 6 lines."""
    rng = random.Random(7)
    p = tmp_path / "training.csv"
    rows = ["InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country"]
    for inv in range(40):
        base = 1.0 + rng.random() * 50
        for line in range(6):
            rows.append(
                f"5{inv:04d},85{line:03d}A,ITEM {line},{rng.randint(1, 12)},"
                f"12/{1 + inv % 28}/2010 {6 + inv % 12}:{line * 7 % 60:02d},"
                f"{base + rng.random():.2f},1{inv:04d},United Kingdom"
            )
    p.write_text("\n".join(rows))
    return str(p)


def test_train_cli_persists_detector(spark, training_csv, tmp_path, capsys):
    out_dir = str(tmp_path / "det")
    rc = main(
        [
            "train",
            training_csv,
            out_dir,
            "--max-k",
            "3",
            "--threshold-k",
            "5",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["algo"] == "kmeans" and summary["k"] >= 1
    assert summary["threshold"] > 0

    # artifacts on disk: model dir + detector meta + elbow record
    assert os.path.isdir(os.path.join(out_dir, "model"))
    meta = json.load(open(os.path.join(out_dir, "detector.json")))
    assert meta["algo"] == "kmeans"
    sel = json.load(open(os.path.join(out_dir, "model_selection.json")))
    assert sel["k"] == summary["k"] and len(sel["costs"]) == 3

    # reloadable and usable for scoring
    from spark_streaming_invoice_anomaly_detection_spark.ml.clustering import load_detector

    det = load_detector(spark, out_dir)
    assert det.threshold == summary["threshold"]


def test_produce_cli_drips_chunks(tmp_path, capsys):
    src = tmp_path / "replay.csv"
    src.write_text("\n".join(f"line{i},a,b,1,12/1/2010 8:00,1.0,c,UK" for i in range(120)))
    watch = str(tmp_path / "watch")
    rc = main(
        [
            "produce",
            str(src),
            watch,
            "--min-ms",
            "0.1",
            "--max-ms",
            "0.3",
            "--chunk-lines",
            "50",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["lines"] == 120
    assert stats["chunks"] == 3  # 50 + 50 + 20
    files = sorted(os.listdir(watch))
    assert len(files) == 3
    total = sum(
        len(open(os.path.join(watch, f)).read().splitlines()) for f in files
    )
    assert total == 120


def test_pipeline_requires_source(capsys):
    rc = main(["pipeline", "a", "b"])
    assert rc == 2


@pytest.mark.slow
def test_full_cli_loop_train_produce_pipeline(spark, training_csv, tmp_path):
    """The reference's whole operational story through the CLI surfaces:
    train both detectors, replay the training file paced into a watch
    dir, run the pipeline in file-source mode, and assert anomaly/
    erroneous parquet outputs appear. Uses the library entry points the
    CLI commands wrap (pipeline's awaitTermination is driven here by
    polling + stop instead)."""
    import time

    from spark_streaming_invoice_anomaly_detection_spark.__main__ import main
    from spark_streaming_invoice_anomaly_detection_spark.ml.clustering import (
        load_detector,
    )
    from spark_streaming_invoice_anomaly_detection_spark.sources.replay import (
        PacedReplayProducer,
    )
    from spark_streaming_invoice_anomaly_detection_spark.streaming.pipeline import (
        PipelineSinks,
        start_pipeline,
    )

    det_k = str(tmp_path / "det_k")
    det_b = str(tmp_path / "det_b")
    assert main(["train", training_csv, det_k, "--max-k", "3",
                 "--threshold-k", "5"]) == 0
    assert main(["train", training_csv, det_b, "--algo", "bisecting",
                 "--max-k", "3", "--threshold-k", "5"]) == 0

    watch = tmp_path / "watch"
    watch.mkdir()
    lines = [
        ln for ln in open(training_csv).read().splitlines()[1:] if ln.strip()
    ]
    producer = PacedReplayProducer(
        lines, str(watch), delay_ms=(0.2, 0.5), chunk_lines=60
    )

    out = tmp_path / "out"

    def parquet_sink(name):
        d = out / name
        d.mkdir(parents=True, exist_ok=True)

        def write(df, _e):
            df.write.mode("append").parquet(str(d))

        return write

    sinks = PipelineSinks(
        erroneous=parquet_sink("erroneous"),
        cancellations=parquet_sink("cancellations"),
        kmeans_anomalies=parquet_sink("kmeans"),
        bisect_anomalies=parquet_sink("bisect"),
    )
    raw = spark.readStream.format("text").load(str(watch))
    handle = start_pipeline(
        raw,
        sinks,
        kmeans=load_detector(spark, det_k),
        bisect=load_detector(spark, det_b),
        trigger_seconds=1,
        expiry_ticks=2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    try:
        producer.start()
        producer.join(timeout=30)

        def emitted():
            try:
                return (
                    spark.read.parquet(str(out / "kmeans")).count()
                    + spark.read.parquet(str(out / "bisect")).count()
                )
            except Exception:
                return 0

        deadline = time.time() + 120
        while time.time() < deadline and emitted() == 0:
            time.sleep(2)
        # threshold-k=5 on 40 invoices guarantees ~4 training invoices
        # score above their own threshold; replaying the SAME data must
        # therefore surface anomalies through the stateful operator,
        # scoring, and parquet delivery
        assert emitted() > 0, "no anomalies flowed through the full loop"
    finally:
        handle.stop()


def test_sql_cli_runs_adhoc_query(spark, capsys):
    rc = main(
        [
            "sql",
            "SELECT r_name, count(*) AS n FROM region GROUP BY r_name ORDER BY r_name",
            "--sf-dir",
            os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5 and all(r["n"] == 1 for r in lines)


def test_query_cli_lists_and_runs_registered_query(spark, capsys):
    assert main(["query", "list"]) == 0
    listing = capsys.readouterr().out
    assert "pricing_summary" in listing and "minhash_lsh_neardups" in listing

    rc = main(
        [
            "query",
            "pricing_summary",
            "--sf-dir",
            os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
        ]
    )
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and {"l_returnflag", "l_linestatus"} <= set(rows[0])

    assert main(["query", "no_such_query"]) == 2


def test_state_cli_census_and_meta(spark, tmp_path, capsys):
    """Build a small agg checkpoint, then read it back through the CLI."""
    import pyspark.sql.functions as F

    src = tmp_path / "in"
    os.makedirs(src)
    with open(src / "a.csv", "w") as f:
        f.write("k1,1\nk2,2\nk3,3\n")
    raw = (
        spark.readStream.format("csv").schema("k string, v int").load(str(src))
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        raw.groupBy("k")
        .agg(F.sum("v").alias("s"))
        .writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    assert main(["state", "census", ckpt]) == 0
    census = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert census["n_keys"] == 3

    assert main(["state", "meta", ckpt]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["operatorName"] == "stateStoreSave"

    assert main(["state", "dump", ckpt]) == 0
    dump = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
    ]
    assert sorted(d["key"]["k"] for d in dump) == ["k1", "k2", "k3"]
