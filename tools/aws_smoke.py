"""Real-AWS smoke test for the Kinesis binding — the ONE check that
cannot run in the offline build container (the binding is verified
end-to-end there through an injected stateful fake; see
tests/test_kinesis_aws.py). A deployer with AWS credentials runs THIS
against a real (disposable) stream before first production use.

What it proves, in order:
  1. produce: PutRecords through the exactly-once-paired producer path
     (KinesisAwsStreamWriter's batching + per-record retry surface).
  2. batch read: format("kinesis_aws") spark.read drains every record
     exactly once (zero loss, zero dup, per-shard order).
  3. streaming + restart: readStream with a checkpoint, stopped
     mid-stream and restarted, still delivers every record exactly
     once to a file sink (offset commit + readBetweenOffsets replay
     against real GetRecords/ResourceNotFound behavior).

Usage (charges a few cents of Kinesis on-demand throughput):

    export AWS_REGION=us-east-1          # or --region
    python tools/aws_smoke.py --stream spark-graft-smoke \
        [--create] [--shards 2] [--records 500] [--region ...] \
        [--role-arn arn:aws:iam::...:role/... [--policy-arn ...]]

--create makes the stream (on-demand mode) and deletes it afterwards.
Exit 0 = all three phases green. Requires: boto3, network, pyspark.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _client(args):
    import boto3

    kw = {"region_name": args.region} if args.region else {}
    return boto3.client("kinesis", **kw)


def _wait_active(client, name: str, timeout_s: int = 120) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        d = client.describe_stream_summary(StreamName=name)
        if d["StreamDescriptionSummary"]["StreamStatus"] == "ACTIVE":
            return
        time.sleep(3)
    raise TimeoutError(f"stream {name} not ACTIVE after {timeout_s}s")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--stream", required=True)
    p.add_argument("--region", default=os.environ.get("AWS_REGION"))
    p.add_argument("--create", action="store_true")
    p.add_argument("--shards", type=int, default=2)
    p.add_argument("--records", type=int, default=500)
    p.add_argument("--role-arn")
    p.add_argument("--policy-arn")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from arc_kinesis_tagging_spark.session import get_session
    from arc_kinesis_tagging_spark.streaming.kinesis_aws import (
        KinesisAwsDataSource,
    )

    client = _client(args)
    if args.create:
        client.create_stream(
            StreamName=args.stream,
            StreamModeDetails={"StreamMode": "ON_DEMAND"},
        )
        _wait_active(client, args.stream)
        print(f"created stream {args.stream}")

    opts = {"streamName": args.stream}
    if args.region:
        opts["region"] = args.region
    if args.role_arn:
        opts["roleArn"] = args.role_arn
        if args.policy_arn:
            opts["policyArn"] = args.policy_arn

    spark = get_session("aws_smoke")
    spark.dataSource.register(KinesisAwsDataSource)
    n = args.records
    try:
        # -- 1. produce --------------------------------------------------
        payloads = spark.range(n).select(
            F.encode(
                F.format_string('{"i": %d}', F.col("id")), "utf-8"
            ).alias("data"),
            F.col("id").cast("string").alias("partition_key"),
        )
        # one-shot micro-batch through the stream writer path
        src = tempfile.mkdtemp(prefix="smoke_src_")
        ckpt_w = tempfile.mkdtemp(prefix="smoke_wck_")
        payloads.write.mode("overwrite").parquet(src)
        q = (
            spark.readStream.schema("data binary, partition_key string")
            .parquet(src)
            .writeStream.format("kinesis_aws")
            .options(**opts)
            .option("checkpointLocation", ckpt_w)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        print(f"phase 1 OK: produced {n} records")

        # -- 2. batch read: exactly the produced set ---------------------
        got = (
            spark.read.format("kinesis_aws")
            .options(**opts)
            .load()
            .select(F.get_json_object(F.decode("data", "utf-8"), "$.i")
                    .cast("long").alias("i"))
        )
        ids = sorted(r["i"] for r in got.collect())
        assert ids == list(range(n)), (
            f"batch read lost/duped: {len(ids)} rows, "
            f"first diff at {next((k for k, v in enumerate(ids) if v != k), None)}"
        )
        print(f"phase 2 OK: batch read {n} records, zero loss/dup")

        # -- 3. streaming with mid-stream restart ------------------------
        ckpt = tempfile.mkdtemp(prefix="smoke_ck_")
        sink = tempfile.mkdtemp(prefix="smoke_out_")

        def run(stop_after_s: float) -> None:
            qq = (
                spark.readStream.format("kinesis_aws")
                .options(**opts)
                .option("startingPosition", "TRIM_HORIZON")
                .option("maxRecordsPerShardPerBatch", "50")
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="2 seconds")
                .start()
            )
            time.sleep(stop_after_s)
            qq.stop()
            qq.awaitTermination(60)

        run(15.0)   # partial drain, killed mid-stream
        run(45.0)   # restart from the checkpoint, finish the drain
        out = spark.read.parquet(sink).select(
            F.get_json_object(F.decode("data", "utf-8"), "$.i")
            .cast("long").alias("i")
        )
        ids2 = sorted(r["i"] for r in out.collect())
        assert ids2 == list(range(n)), (
            f"stream restart lost/duped: {len(ids2)} rows vs {n}"
        )
        print(f"phase 3 OK: checkpointed restart delivered {n} exactly once")
        print(json.dumps({"smoke": "PASS", "records": n}))
        return 0
    finally:
        if args.create:
            client.delete_stream(
                StreamName=args.stream, EnforceConsumerDeletion=True
            )
            print(f"deleted stream {args.stream}")
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
