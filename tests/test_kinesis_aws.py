"""The real-AWS Kinesis binding (streaming/kinesis_aws.py), driven
offline through the shipped stateful fake (kinesis_testing.py — the
MockProducer pattern): shard discovery pagination, the consume loop's
caps and offset tags, KCL-style reshard ordering, throttle backoff,
iterator-expiry recovery, replay determinism, and the PutRecords
producer's partial-failure retry. Reference parity targets:
utility/aws.py:6-65 (iterator/records chaining), app.py:16-24
(client config), app.py:35-46 (per-record handling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.streaming import kinesis_aws
from arc_kinesis_tagging_spark.streaming.kinesis_aws import (
    KinesisAwsSimpleReader,
    KinesisAwsStreamWriter,
)
from arc_kinesis_tagging_spark.streaming.kinesis_testing import (
    reset_fake_client,
)

FACTORY = (
    "arc_kinesis_tagging_spark.streaming.kinesis_testing:make_fake_client"
)


def _reader(**over):
    opts = {
        "streamname": "test-stream",
        "clientfactory": FACTORY,
        "maxrecordspershardperbatch": "1000",
        **{k.lower(): str(v) for k, v in over.items()},
    }
    return KinesisAwsSimpleReader(opts)


@pytest.fixture()
def fake(monkeypatch):
    sleeps = []
    monkeypatch.setattr(kinesis_aws, "_SLEEP", sleeps.append)
    c = reset_fake_client()
    c.sleeps = sleeps
    return c


def test_initial_offset_discovers_all_shards_paginated(fake):
    for i in range(5):  # page size 2 -> 3 ListShards pages
        fake.add_shard(f"shard-{i:04d}")
    r = _reader()
    assert r.initialOffset() == {
        f"shard-{i:04d}": "TRIM_HORIZON" for i in range(5)
    }
    assert fake.calls.count("list_shards") == 3
    latest = _reader(startingPosition="LATEST").initialOffset()
    assert set(latest) == {f"shard-{i:04d}" for i in range(5)}
    # LATEST resolves to ONE concrete TS anchor shared by all shards
    assert len({t for t in latest.values()}) == 1
    assert all(t.startswith("TS:") for t in latest.values())


def test_read_drains_and_resumes_without_dup_or_skip(fake):
    fake.add_shard("shard-a")
    fake.add_shard("shard-b")
    seqs = {s: [fake.put(s, f"{s}-{i}".encode()) for i in range(7)]
            for s in ("shard-a", "shard-b")}
    r = _reader(maxRecordsPerShardPerBatch=5, getRecordsLimit=3)
    rows1, off1 = r.read(r.initialOffset())
    rows1 = list(rows1)
    # cap respected per shard; tags point at the 5th record
    assert [x[2] for x in rows1 if x[1] == "shard-a"] == seqs["shard-a"][:5]
    assert off1["shard-a"] == "AFTER:" + seqs["shard-a"][4]
    rows2, off2 = r.read(off1)
    rows2 = list(rows2)
    assert [x[2] for x in rows2 if x[1] == "shard-b"] == seqs["shard-b"][5:]
    # drained: third read returns nothing and keeps the tags
    rows3, off3 = r.read(off2)
    assert list(rows3) == [] and off3 == off2
    # no duplicates or gaps across the two consuming reads
    got = [x[2] for x in rows1 + rows2 if x[1] == "shard-a"]
    assert got == seqs["shard-a"]


def test_latest_resolves_to_concrete_ts_anchor(fake):
    """startingPosition=LATEST must become a concrete AT_TIMESTAMP
    anchor at query start: pre-anchor records are excluded, records
    arriving BETWEEN empty polls are never skipped, and a batch read
    from the anchor is replayable (finding: a symbolic LATEST tag
    re-anchored at replay time and silently lost the in-flight
    batch)."""
    fake.add_shard("shard-a")
    fake.put("shard-a", b"old", ts=100.0)
    import arc_kinesis_tagging_spark.streaming.kinesis_aws as ka

    r = _reader(startingPosition="LATEST")
    old_now = ka._NOW
    ka._NOW = lambda: 200.0
    try:
        start = r.initialOffset()
    finally:
        ka._NOW = old_now
    assert start == {"shard-a": "TS:200.0"}
    rows, off = r.read(start)
    assert list(rows) == [] and off == start  # anchor holds, no drift
    s = fake.put("shard-a", b"new", ts=300.0)
    rows, off = r.read(off)
    assert [x[0] for x in rows] == [b"new"]  # 'old' predates the anchor
    assert off == {"shard-a": "AFTER:" + s}
    # the crash-replay window: re-reading (TS anchor, AFTER:s] must
    # reproduce the batch exactly — this is what the symbolic tag lost
    got = list(r.readBetweenOffsets(start, off))
    assert [x[0] for x in got] == [b"new"]


def test_reshard_children_held_until_parent_drained(fake):
    fake.add_shard("shard-p")
    fake.put("shard-p", b"p1")
    fake.put("shard-p", b"p2")
    fake.reshard("shard-p", ["shard-c1", "shard-c2"])
    fake.put("shard-c1", b"c1-1")
    r = _reader(maxRecordsPerShardPerBatch=1)  # parent needs 2 reads
    rows, off = r.read(r.initialOffset())
    rows = list(rows)
    # children discovered (TRIM_HORIZON) but HELD: only parent read
    assert {x[1] for x in rows} == {"shard-p"}
    assert off["shard-c1"] == "TRIM_HORIZON"
    rows, off = r.read(off)
    rows = list(rows)
    # the drain observes the null NextShardIterator in the same
    # response as the last record -> parent CLOSED right here, and the
    # CASCADE releases the children in the SAME poll — parent rows
    # strictly before child rows (the per-original-shard ordering
    # guarantee), no extra empty micro-batch between generations
    assert [x[0] for x in rows] == [b"p2", b"c1-1"]
    assert off["shard-p"] == "CLOSED"
    assert off["shard-c1"].startswith("AFTER:")
    assert off["shard-c2"] == "TRIM_HORIZON"  # empty child polls fine


def test_throttle_backoff_then_success(fake):
    fake.add_shard("shard-a")
    s = fake.put("shard-a", b"x")
    fake.throttle_next = 3
    r = _reader(pollBackoffMs=100)
    rows, off = r.read(r.initialOffset())
    assert [x[2] for x in list(rows)] == [s]
    # three retries, exponential: 0.1, 0.2, 0.4
    assert fake.sleeps == [0.1, 0.2, 0.4]


def test_throttle_exhaustion_raises(fake):
    fake.add_shard("shard-a")
    fake.put("shard-a", b"x")
    fake.throttle_next = 99
    r = _reader(maxRetries=2)
    with pytest.raises(Exception) as ei:
        r.read(r.initialOffset())
    assert "ProvisionedThroughputExceeded" in str(ei.value)
    assert len(fake.sleeps) == 2  # maxRetries sleeps, then raise


def test_expired_iterator_recovers_from_last_position(fake):
    fake.add_shard("shard-a")
    seqs = [fake.put("shard-a", f"r{i}".encode()) for i in range(4)]
    r = _reader(getRecordsLimit=2)
    # expire the iterator the SECOND get_records will use: consume 2,
    # then the next token dies -> reader must re-acquire AFTER:seq[1]
    orig = fake.get_records

    def poisoned(**kw):
        out = orig(**kw)
        if out["Records"] and out["Records"][-1][
            "SequenceNumber"
        ] == seqs[1] and out["NextShardIterator"]:
            fake.expire_tokens.add(out["NextShardIterator"])
        return out

    fake.get_records = poisoned
    rows, off = r.read(r.initialOffset())
    assert [x[2] for x in list(rows)] == seqs  # nothing lost or doubled
    assert off == {"shard-a": "AFTER:" + seqs[3]}


def test_read_between_offsets_replays_exact_range(fake):
    fake.add_shard("shard-a")
    seqs = [fake.put("shard-a", f"r{i}".encode()) for i in range(6)]
    r = _reader(getRecordsLimit=2)
    start = {"shard-a": "AFTER:" + seqs[1]}
    end = {"shard-a": "AFTER:" + seqs[4]}
    got = [x[2] for x in r.readBetweenOffsets(start, end)]
    assert got == seqs[2:5]  # exactly (start, end], no tail overshoot
    # equal tags -> empty replay
    assert list(r.readBetweenOffsets(end, end)) == []


class _Row:
    def __init__(self, data, pk):
        self.data = data
        self.partition_key = pk


def test_put_records_batches_and_retries_only_failures(fake, monkeypatch):
    fake.add_shard("shard-a")
    fake.fail_put_pks = {"bad": 2}  # pk 'bad' fails twice, then lands
    w = KinesisAwsStreamWriter(
        {"streamname": "test-stream", "clientfactory": FACTORY,
         "pollbackoffms": "50"}
    )
    rows = [_Row(f"d{i}".encode(), "ok") for i in range(601)]
    rows.append(_Row(b"poison", "bad"))
    msg = w.write(iter(rows))
    assert msg.n == 602
    published = [
        d for s in fake.shards.values() for (_, d, _) in s["records"]
    ]
    assert published.count(b"poison") == 1  # retried entry lands ONCE
    assert len(published) == 602
    # batching: 602 rows -> >=2 API batches (500-record cap) and the
    # failed-entry retries are single-entry calls on top
    assert fake.calls.count("put_records") >= 4
    assert fake.sleeps == [0.05, 0.1]


def test_put_records_exhaustion_raises(fake):
    fake.add_shard("shard-a")
    fake.fail_put_pks = {"bad": 99}
    w = KinesisAwsStreamWriter(
        {"streamname": "test-stream", "clientfactory": FACTORY,
         "maxretries": "1"}
    )
    with pytest.raises(RuntimeError) as ei:
        w.write(iter([_Row(b"x", "bad")]))
    assert "still failing" in str(ei.value)


def test_spark_stream_e2e_through_fake(spark, tmp_path):
    """The wiring test: register the data source, readStream with the
    FILE-SEEDED fake factory (Spark runs the simple stream reader in
    its own Python worker, where the test-process singleton is
    invisible), drain with availableNow into a memory sink — the
    worker-side reader runs the same loops the unit tests pin."""
    import base64
    import json

    from arc_kinesis_tagging_spark.streaming.kinesis_aws import (
        KinesisAwsDataSource,
    )
    from arc_kinesis_tagging_spark.streaming.kinesis_testing import (
        SEED_PATH,
    )

    seed = {"shards": {"shard-a": [], "shard-b": []}}
    for i in range(10):
        seed["shards"][f"shard-{'ab'[i % 2]}"].append(
            [base64.b64encode(f"rec-{i}".encode()).decode(), str(i)]
        )
    with open(SEED_PATH, "w") as fh:
        json.dump(seed, fh)
    spark.dataSource.register(KinesisAwsDataSource)
    q = (
        spark.readStream.format("kinesis_aws")
        .option("streamName", "test-stream")
        .option(
            "clientFactory",
            "arc_kinesis_tagging_spark.streaming.kinesis_testing:"
            "make_file_seeded_client",
        )
        .load()
        .writeStream.format("memory")
        .queryName("aws_e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from aws_e2e").collect()
    assert {bytes(r["data"]) for r in rows} == {
        f"rec-{i}".encode() for i in range(10)
    }
    assert {r["shard_id"] for r in rows} == {"shard-a", "shard-b"}
    assert all(r["partition_key"] is not None for r in rows)


def test_assume_role_request_shape_via_botocore_stubber():
    """The scoped assume-role call (reference utility/aws.py:27-46)
    validated against the REAL service model: botocore's Stubber
    rejects any parameter drift (wrong PolicyArns shape, missing
    session name) at request-serialization time, no network needed."""
    import datetime

    import boto3
    from botocore.stub import Stubber

    from arc_kinesis_tagging_spark.streaming.kinesis_aws import (
        _assume_role_credentials,
    )

    sts = boto3.client(
        "sts",
        region_name="us-east-1",
        aws_access_key_id="AKIAFAKE",
        aws_secret_access_key="fake",
    )
    creds = {
        "AccessKeyId": "ASIAFAKEFAKEFAKE",  # service model: len >= 16
        "SecretAccessKey": "s",
        "SessionToken": "t",
        "Expiration": datetime.datetime(
            2030, 1, 1, tzinfo=datetime.timezone.utc
        ),
    }
    with Stubber(sts) as stub:
        stub.add_response(
            "assume_role",
            {
                "Credentials": creds,
                "AssumedRoleUser": {
                    "AssumedRoleId": "AROAFAKE:session",
                    "Arn": "arn:aws:sts::1:assumed-role/r/s",
                },
            },
            expected_params={
                "RoleArn": "arn:aws:iam::1:role/tagger",
                "RoleSessionName": "arc-kinesis-tagging-spark",
                "PolicyArns": [{"arn": "arn:aws:iam::1:policy/scoped"}],
            },
        )
        got = _assume_role_credentials(
            sts,
            "arn:aws:iam::1:role/tagger",
            "arn:aws:iam::1:policy/scoped",
        )
    assert got["AccessKeyId"] == "ASIAFAKEFAKEFAKE"


def test_refreshing_client_reassumes_before_expiry(monkeypatch):
    """The production gap the reference leaves open: its one-shot
    assume_role dies when the STS token lapses mid-consume. The
    refreshing wrapper must re-assume when attribute access lands
    inside the expiry margin, and not before."""
    from arc_kinesis_tagging_spark.streaming.kinesis_aws import (
        RefreshingKinesisClient,
    )

    now = [1000.0]
    monkeypatch.setattr(kinesis_aws, "_NOW", lambda: now[0])
    assumed = []

    class FakeSts:
        def assume_role(self, **kw):
            assumed.append(kw)
            return {
                "Credentials": {
                    "AccessKeyId": f"K{len(assumed)}",
                    "SecretAccessKey": "s",
                    "SessionToken": "t",
                    "Expiration": now[0] + 3600.0,
                }
            }

    class FakeKinesis:
        def __init__(self, creds):
            self.key = creds["AccessKeyId"]

        def list_shards(self, **kw):
            return {"Shards": [], "key": self.key}

    c = RefreshingKinesisClient(
        {"rolearn": "arn:role", "policyarn": "arn:policy"},
        sts_factory=FakeSts,
        kinesis_factory=FakeKinesis,
    )
    assert len(assumed) == 1
    assert assumed[0]["PolicyArns"] == [{"arn": "arn:policy"}]
    assert c.list_shards()["key"] == "K1"
    now[0] += 3000.0  # inside the token's life, outside the margin
    assert c.list_shards()["key"] == "K1" and len(assumed) == 1
    now[0] += 400.0  # within 300 s of expiry -> transparent re-assume
    assert c.list_shards()["key"] == "K2" and len(assumed) == 2


def test_aged_out_shard_closes_instead_of_crashing(fake):
    """A shard present in the checkpoint but gone from ListShards has
    aged out of retention: the reader must mark it CLOSED (its data is
    unrecoverable from Kinesis) rather than crash get_shard_iterator
    on every subsequent poll — and a child held on such a parent is
    released by the cascade in the same poll."""
    fake.add_shard("shard-old")
    fake.add_shard("shard-live")
    s = fake.put("shard-live", b"x")
    r = _reader()
    start = {
        "shard-old": "AFTER:123",       # checkpointed position
        "shard-live": "TRIM_HORIZON",
        "shard-child": "TRIM_HORIZON",  # child of the aged-out parent
    }
    del fake.shards["shard-old"]  # aged out of the listing
    fake.add_shard("shard-child", parents=["shard-old"])
    fake.put("shard-child", b"c")
    rows, off = r.read(start)
    rows = list(rows)
    assert off["shard-old"] == "CLOSED"
    assert [x[2] for x in rows if x[1] == "shard-live"] == [s]
    # the cascade marks the aged-out parent CLOSED and releases the
    # child in the SAME poll — no extra micro-batch of latency
    assert [x[0] for x in rows if x[1] == "shard-child"] == [b"c"]
    assert off["shard-child"].startswith("AFTER:")


def test_batch_backfill_read_through_fake(spark, tmp_path):
    """spark.read.format('kinesis_aws'): shard-parallel backfill —
    every shard drained from TRIM_HORIZON; a startTag bounds the
    replay start. Seeded via the cross-process file factory (driver
    partitions() and each executor task build their own fake from the
    same seed)."""
    import base64
    import json

    from arc_kinesis_tagging_spark.streaming.kinesis_aws import (
        KinesisAwsDataSource,
    )
    from arc_kinesis_tagging_spark.streaming.kinesis_testing import (
        SEED_PATH,
    )

    seed = {"shards": {"shard-a": [], "shard-b": []}}
    for i in range(8):
        seed["shards"][f"shard-{'ab'[i % 2]}"].append(
            [base64.b64encode(f"bf-{i}".encode()).decode(), str(i)]
        )
    with open(SEED_PATH, "w") as fh:
        json.dump(seed, fh)
    spark.dataSource.register(KinesisAwsDataSource)
    df = (
        spark.read.format("kinesis_aws")
        .option("streamName", "test-stream")
        .option(
            "clientFactory",
            "arc_kinesis_tagging_spark.streaming.kinesis_testing:"
            "make_file_seeded_client",
        )
        .load()
    )
    rows = df.collect()
    assert {bytes(r["data"]) for r in rows} == {
        f"bf-{i}".encode() for i in range(8)
    }
    assert {r["shard_id"] for r in rows} == {"shard-a", "shard-b"}
    # a TS bound is the valid batch start (timestamps are stream-wide);
    # TS:0 covers everything
    from arc_kinesis_tagging_spark.streaming.kinesis_aws import (
        KinesisAwsBatchReader,
    )

    opts = {
        "streamname": "test-stream",
        "clientfactory": "arc_kinesis_tagging_spark.streaming."
        "kinesis_testing:make_file_seeded_client",
    }
    # the direct (in-process) read below shares the pytest process's
    # fake singleton, which other tests reset/mutate — rebuild it from
    # the seed file so this test is order-independent
    reset_fake_client()
    from arc_kinesis_tagging_spark.streaming.kinesis_testing import (
        make_file_seeded_client,
    )

    make_file_seeded_client()
    ts_rows = list(
        KinesisAwsBatchReader({**opts, "starttag": "TS:0.0"}).read(
            type("P", (), {"shard_id": "shard-a"})()
        )
    )
    assert len(ts_rows) == 4
    # AFTER:<seq> is per-shard by nature -> rejected for batch reads
    # (real AWS raises InvalidArgumentException on every OTHER shard);
    # LATEST reads nothing by construction -> also rejected
    with pytest.raises(ValueError, match="per-shard"):
        KinesisAwsBatchReader({**opts, "starttag": "AFTER:5"})
    with pytest.raises(ValueError, match="LATEST"):
        KinesisAwsBatchReader({**opts, "startingposition": "latest"})


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# an "op script": each element either puts a record into a live shard
# (int = shard pick), triggers a reshard of a live shard into two
# children ("R"), or polls the reader ("P")
_ops = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=3),
        st.just("R"),
        st.just("P"),
    ),
    min_size=1,
    max_size=40,
)


@given(ops=_ops, cap=st.integers(min_value=1, max_value=7))
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_consume_loop_no_dup_no_skip_in_order(ops, cap):
    """PROPERTY: across ANY interleaving of puts, reshards, and polls
    (with any per-poll admission cap), draining the stream yields
    every record exactly once, and per ORIGINAL shard the sequence
    numbers come out in order — the connector's core contract
    (reference app.py's consume loop, minus its crash-and-hope
    recovery)."""
    from arc_kinesis_tagging_spark.streaming.kinesis_testing import (
        FakeKinesisClient,
    )

    fake = FakeKinesisClient()
    fake.add_shard("shard-0000")
    live = ["shard-0000"]
    next_shard = [1]
    put_log: dict[str, list[str]] = {}

    r = KinesisAwsSimpleReader(
        {
            "streamname": "test-stream",
            "clientfactory": FACTORY,
            "maxrecordspershardperbatch": str(cap),
            "getrecordslimit": "3",
        }
    )
    r._factory = lambda: fake  # bind THIS fake, not the singleton

    got: list[tuple[str, str]] = []
    off = r.initialOffset()

    def poll():
        nonlocal off
        rows, off = r.read(off)
        for data, shard, seq, _pk in rows:
            got.append((shard, seq))

    n_put = 0
    for op in ops:
        if op == "P":
            poll()
        elif op == "R":
            # reshard the oldest live shard into two children
            parent = live.pop(0)
            c1 = f"shard-{next_shard[0]:04d}"
            c2 = f"shard-{next_shard[0] + 1:04d}"
            next_shard[0] += 2
            fake.reshard(parent, [c1, c2])
            live.extend([c1, c2])
        else:
            sid = live[int(op) % len(live)]
            seq = fake.put(sid, f"r{n_put}".encode())
            put_log.setdefault(sid, []).append(seq)
            n_put += 1
    # drain: poll until two consecutive polls move nothing
    idle = 0
    while idle < 2:
        before = len(got)
        poll()
        idle = idle + 1 if len(got) == before else 0

    want = sorted(
        (sid, seq) for sid, seqs in put_log.items() for seq in seqs
    )
    assert sorted(got) == want  # every record exactly once
    for sid, seqs in put_log.items():  # per-shard order preserved
        assert [s for sh, s in got if sh == sid] == seqs


def test_list_shards_throttle_backs_off(fake):
    """ListShards is the lowest-TPS Kinesis API and runs on EVERY
    micro-batch poll (shard discovery): a LimitExceededException must
    retry through the same backoff shell as the data calls, not fail
    the streaming query."""
    fake.add_shard("shard-a")
    s = fake.put("shard-a", b"x")
    fake.throttle_next_list = 3
    r = _reader(pollBackoffMs=100)
    rows, off = r.read(r.initialOffset())
    assert [x[2] for x in list(rows)] == [s]
    assert fake.sleeps == [0.1, 0.2, 0.4]
    # exhaustion still raises (same policy as the data calls)
    fake.throttle_next_list = 99
    r2 = _reader(maxRetries=1)
    with pytest.raises(Exception) as ei:
        r2.initialOffset()
    assert "LimitExceededException" in str(ei.value)


def test_replay_skips_shard_aged_out_after_drain(fake):
    """Recovery replay of a committed range whose end tag is CLOSED
    must survive the shard aging out of the stream between the commit
    and the replay (read() can commit start AFTER:<seq> -> end CLOSED;
    a restart then calls get_shard_iterator on a vanished shard).
    Without the guard, ResourceNotFoundException fails recovery on
    EVERY restart — the query can never get past that epoch."""
    fake.add_shard("shard-gone")
    fake.add_shard("shard-live")
    sg = fake.put("shard-gone", b"g")
    sl = [fake.put("shard-live", f"l{i}".encode()) for i in range(3)]
    r = _reader()
    start = {"shard-gone": "AFTER:" + sg, "shard-live": "TRIM_HORIZON"}
    end = {"shard-gone": "CLOSED", "shard-live": "AFTER:" + sl[1]}
    del fake.shards["shard-gone"]  # aged out between commit and replay
    got = [x[2] for x in r.readBetweenOffsets(start, end)]
    assert got == sl[:2]  # live shard replays exactly; gone shard skipped
    # a NON-CLOSED end tag on a vanished shard is data loss -> raises
    end_bad = {"shard-gone": "AFTER:" + sg, "shard-live": "AFTER:" + sl[1]}
    start_bad = {"shard-gone": "TRIM_HORIZON", "shard-live": "TRIM_HORIZON"}
    with pytest.raises(Exception) as ei:
        list(r.readBetweenOffsets(start_bad, end_bad))
    assert "ResourceNotFoundException" in str(ei.value)
