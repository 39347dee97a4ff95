"""Real AWS Kinesis binding: ``spark.readStream.format("kinesis_aws")``
and ``df.writeStream.format("kinesis_aws")`` over boto3.

This is the production counterpart of the file-backed emulator
(``kinesis_source.py``): the emulator pins the CONNECTOR SEMANTICS
(shard parallelism, per-shard monotone offsets, checkpoint recovery,
resharding discovery, admission caps, exactly-once produce) against a
medium this container can verify end-to-end; THIS module binds the
same consume loop to the actual AWS API surface the reference uses
(reference utility/aws.py:6-65 — get_shard_iterator/get_records with
NextShardIterator chaining; app.py:16-24 — client construction from
region/credentials config).

Design notes:

- **SimpleDataSourceStreamReader, not the partitioned reader.**
  Kinesis has no "tip offset" API: you cannot know a shard's end
  sequence number without reading it, so the partitioned reader's
  latestOffset()/partitions() split cannot be implemented honestly
  (connectors that try either double-read on the driver or lie about
  the end offset). The simple reader's contract — ``read(start) ->
  (records, nextOffset)`` — matches GetRecords exactly: consume up to
  the per-shard cap, report where you actually got to. Spark persists
  the prefetched batch for replay, and ``readBetweenOffsets`` re-reads
  from Kinesis (24 h+ retention) on recovery. The reference's consume
  loop is single-process poll-per-shard (~13 rec/s ceiling measured
  in BASELINE.md); this driver-side loop already outruns it by orders
  of magnitude, and shard-parallel scaling belongs to the fan-out
  AFTER ingestion, which is ordinary Spark.

- **Offsets** are JSON dicts ``{shard_id: tag}`` with tags
  ``"TRIM_HORIZON"`` (read from start), ``"TS:<epoch-seconds>"`` (an
  AT_TIMESTAMP anchor — ``startingPosition=LATEST`` resolves to the
  query-start wall clock ONCE in initialOffset, so the position is
  concrete and every replay is deterministic; a symbolic LATEST tag
  would re-anchor at replay time and silently lose the in-flight
  batch on recovery), ``"AFTER:<seq>"`` (resume after a concrete
  sequence number — the checkpointable steady state), and
  ``"CLOSED"`` (shard drained to its end after a reshard or aged out
  of retention).

- **Resharding**: new shards appear via paginated ListShards on every
  poll and enter at TRIM_HORIZON; a child shard is HELD (not read)
  while any parent is still open, so per-key order across a reshard
  is preserved exactly like the KCL. A parent returning a null
  NextShardIterator is drained -> CLOSED, which releases its children
  on the next poll.

- **Error handling**: ProvisionedThroughputExceededException /
  LimitExceededException back off exponentially (base
  ``pollBackoffMs``, capped retries); ExpiredIteratorException
  re-acquires the iterator from the last consumed position — both are
  the loops the reference handles implicitly by crashing and
  restarting (app.py's bare consume loop).

- **Producer** (``KinesisAwsStreamWriter``): executor-side PutRecords
  in API-shaped batches (<=500 records / <=5 MiB), retrying ONLY the
  failed entries of a partial failure (per-record isolation, R16).
  Kinesis has no idempotent produce, so the sink is at-least-once;
  exactly-once tagging belongs to the keyed upsert sink downstream
  (R15), which is idempotent by key.

- **Offline testability**: the boto3 client is built by a factory
  resolved from the ``clientFactory`` option (``"module:function"``),
  defaulting to ``boto3.client("kinesis", ...)`` with region/endpoint
  options passed through. Tests inject
  ``kinesis_testing:make_fake_client`` — a stateful in-process fake
  implementing the five calls this module uses (the same pattern as
  Kafka's shipped MockProducer/MockConsumer), so every loop above is
  pinned without a network.
"""

from __future__ import annotations

import json
import time

from dataclasses import dataclass as _dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "data binary, shard_id string, seq string, partition_key string"

# Kinesis PutRecords hard limits (public API contract)
_PUT_MAX_RECORDS = 500
_PUT_MAX_BYTES = 5 * 1024 * 1024

# patchable sleep hook so backoff tests don't wall-clock sleep
_SLEEP = time.sleep

_RETRYABLE = {
    "ProvisionedThroughputExceededException",
    "LimitExceededException",
    "InternalFailure",
    "ServiceUnavailable",
}


def _error_code(exc) -> str | None:
    """Best-effort AWS error code: botocore ClientError carries it in
    ``response["Error"]["Code"]``; fakes may set ``.code``."""
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        code = (resp.get("Error") or {}).get("Code")
        if code:
            return code
    return getattr(exc, "code", None)


# patchable clock for the assume-role expiry tests
_NOW = time.time


def _assume_role_credentials(
    sts,
    role_arn: str,
    policy_arn: str | None = None,
    session_name: str = "arc-kinesis-tagging-spark",
) -> dict:
    """The reference's scoped assume-role (utility/aws.py:6-46): STS
    AssumeRole with an optional session-limiting PolicyArn; returns the
    temporary ``Credentials`` dict (AccessKeyId/SecretAccessKey/
    SessionToken/Expiration)."""
    kw: dict = {"RoleArn": role_arn, "RoleSessionName": session_name}
    if policy_arn:
        kw["PolicyArns"] = [{"arn": policy_arn}]
    return sts.assume_role(**kw)["Credentials"]


class RefreshingKinesisClient:
    """Kinesis client over STS assume-role credentials that REBUILDS
    itself before the session token expires — the production gap in
    the reference, whose one-shot assume_role (utility/aws.py) dies
    when the ~1 h token lapses mid-consume. Attribute access checks
    the expiry margin and re-assumes transparently, so the consume
    loop never sees an ExpiredTokenException.

    ``sts_factory``/``kinesis_factory`` are injection seams for
    offline tests; production uses boto3."""

    REFRESH_MARGIN_S = 300.0  # re-assume 5 min before expiry

    def __init__(
        self, options: dict, sts_factory=None, kinesis_factory=None
    ) -> None:
        self._o = options
        self._sts_factory = sts_factory
        self._kinesis_factory = kinesis_factory
        self._client = None
        self._expires_at: float | None = None
        self._refresh()

    def _refresh(self) -> None:
        import datetime

        o = self._o
        region = o.get("region")
        if self._sts_factory is not None:
            sts = self._sts_factory()
        else:
            import boto3

            sts = boto3.client("sts", region_name=region)
        creds = _assume_role_credentials(
            sts,
            o["rolearn"],
            o.get("policyarn"),
            o.get("rolesessionname", "arc-kinesis-tagging-spark"),
        )
        exp = creds.get("Expiration")
        self._expires_at = (
            exp.timestamp()
            if isinstance(exp, datetime.datetime)
            else (float(exp) if exp is not None else None)
        )
        if self._kinesis_factory is not None:
            self._client = self._kinesis_factory(creds)
        else:
            import boto3

            kw = {"region_name": region} if region else {}
            if o.get("endpointurl"):
                kw["endpoint_url"] = o["endpointurl"]
            self._client = boto3.client(
                "kinesis",
                aws_access_key_id=creds["AccessKeyId"],
                aws_secret_access_key=creds["SecretAccessKey"],
                aws_session_token=creds["SessionToken"],
                **kw,
            )

    def __getattr__(self, name: str):
        if (
            self._expires_at is not None
            and _NOW() >= self._expires_at - self.REFRESH_MARGIN_S
        ):
            self._refresh()
        return getattr(self._client, name)


def _resolve_client_factory(options: dict):
    """Client factory from options: ``clientFactory=module:function``
    (tests, localstack wrappers, custom credential providers); else
    assume-role with auto-refresh when ``roleArn`` is set (the
    reference's scoped-role auth, app.py:16-24 + utility/aws.py);
    else plain boto3 with region/endpoint/profile passthrough."""
    spec = options.get("clientfactory")
    if spec:
        import importlib

        mod, _, fn = spec.partition(":")
        return getattr(importlib.import_module(mod), fn)

    if options.get("rolearn"):
        return lambda: RefreshingKinesisClient(options)

    def default():
        import boto3

        kw = {}
        if options.get("region"):
            kw["region_name"] = options["region"]
        if options.get("endpointurl"):
            kw["endpoint_url"] = options["endpointurl"]
        session = (
            boto3.Session(profile_name=options["profile"])
            if options.get("profile")
            else boto3
        )
        return session.client("kinesis", **kw)

    return default


def _with_backoff(fn, backoff_ms: int, max_retries: int, **kw):
    """One Kinesis call with exponential backoff on the retryable
    throttle/5xx codes; anything else propagates immediately. Shared
    by the reader's every call and the producer's put_records (whose
    throttling surfaces BOTH as a whole-call exception and as
    per-record ErrorCode entries — this handles the former)."""
    delay = backoff_ms / 1000.0
    for attempt in range(max_retries + 1):
        try:
            return fn(**kw)
        except Exception as exc:
            if (
                _error_code(exc) not in _RETRYABLE
                or attempt == max_retries
            ):
                raise
            _SLEEP(delay)
            delay *= 2


def _list_all_shards(
    client,
    stream_name: str,
    backoff_ms: int = 200,
    max_retries: int = 7,
) -> list[dict]:
    """Paginated ListShards — the reference's describe_stream loop
    (utility/aws.py) modernized to the dedicated API. Runs through
    the same backoff shell as every other reader call: ListShards is
    the lowest-TPS Kinesis API (100 TPS/account) and this runs on
    EVERY micro-batch poll, so an unretried LimitExceededException
    here would fail the streaming query that every data call
    survives."""
    shards, token = [], None
    while True:
        kw = (
            {"NextToken": token}
            if token
            else {"StreamName": stream_name}
        )
        resp = _with_backoff(
            client.list_shards, backoff_ms, max_retries, **kw
        )
        shards.extend(resp.get("Shards", []))
        token = resp.get("NextToken")
        if not token:
            return shards


class KinesisAwsSimpleReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.stream_name = options["streamname"]
        self.start_pos = options.get("startingposition", "TRIM_HORIZON").upper()
        if self.start_pos not in ("TRIM_HORIZON", "LATEST"):
            raise ValueError(
                f"startingPosition must be TRIM_HORIZON or LATEST, "
                f"got {self.start_pos}"
            )
        self.max_per_shard = int(
            options.get("maxrecordspershardperbatch", 1000)
        )
        self.get_limit = min(
            int(options.get("getrecordslimit", 500)), 10000
        )
        self.backoff_ms = int(options.get("pollbackoffms", 200))
        self.max_retries = int(options.get("maxretries", 7))
        self._factory = _resolve_client_factory(options)
        self._client = None
        # live NextShardIterator chain per shard (reference
        # utility/aws.py's chaining): {shard_id: (tag, iterator)} —
        # reused when the next poll starts at the same tag. Purely an
        # API-call saving: every tag is CONCRETE (TRIM_HORIZON /
        # TS:<anchor> / AFTER:<seq>), so a lost chain rebuilds the
        # exact position via get_shard_iterator.
        self._live: dict[str, tuple[str, str]] = {}

    @property
    def client(self):
        if self._client is None:
            self._client = self._factory()
        return self._client

    # -- retry shell -------------------------------------------------------
    def _call(self, fn, **kw):
        return _with_backoff(fn, self.backoff_ms, self.max_retries, **kw)

    def _iterator_for(self, shard_id: str, tag: str) -> str | None:
        if tag == "CLOSED":
            return None
        kw = {"StreamName": self.stream_name, "ShardId": shard_id}
        if tag.startswith("AFTER:"):
            kw["ShardIteratorType"] = "AFTER_SEQUENCE_NUMBER"
            kw["StartingSequenceNumber"] = tag[len("AFTER:"):]
        elif tag.startswith("TS:"):
            kw["ShardIteratorType"] = "AT_TIMESTAMP"
            kw["Timestamp"] = float(tag[len("TS:"):])
        else:
            kw["ShardIteratorType"] = tag  # TRIM_HORIZON
        return self._call(self.client.get_shard_iterator, **kw)[
            "ShardIterator"
        ]

    # -- offsets -----------------------------------------------------------
    def initialOffset(self) -> dict:  # noqa: N802 (Spark API)
        # LATEST resolves to a CONCRETE AT_TIMESTAMP anchor exactly
        # once, here: a symbolic LATEST tag in the offset log would
        # re-anchor at replay time after a crash, so a batch that
        # consumed records from a LATEST start could never be replayed
        # (readBetweenOffsets would anchor past its own data and yield
        # an empty batch — silent loss). With TS:<query-start>, both
        # read() and readBetweenOffsets() are deterministic functions
        # of the checkpointed tags.
        tag = (
            f"TS:{_NOW()}" if self.start_pos == "LATEST" else self.start_pos
        )
        return {
            s["ShardId"]: tag
            for s in _list_all_shards(
                self.client,
                self.stream_name,
                self.backoff_ms,
                self.max_retries,
            )
        }

    def _discover(self, offsets: dict) -> tuple[dict, dict]:
        """Merge newly appeared shards (resharding) into the offset map
        at TRIM_HORIZON and return (offsets, parents-by-shard)."""
        parents: dict[str, list[str]] = {}
        out = dict(offsets)
        for s in _list_all_shards(
            self.client,
            self.stream_name,
            self.backoff_ms,
            self.max_retries,
        ):
            sid = s["ShardId"]
            parents[sid] = [
                p
                for p in (
                    s.get("ParentShardId"),
                    s.get("AdjacentParentShardId"),
                )
                if p
            ]
            if sid not in out:
                # a shard born mid-stream starts at its beginning —
                # records written to it are never skipped, regardless
                # of the stream-level startingPosition
                out[sid] = "TRIM_HORIZON"
        return out, parents

    def _drain_shard(self, shard_id: str, tag: str) -> tuple[list, str]:
        """Consume up to max_per_shard records from one shard starting
        at ``tag``; returns (rows, next_tag). Handles iterator expiry
        by re-acquiring from the last consumed position."""
        rows: list = []
        cached = self._live.get(shard_id)
        it = (
            cached[1]
            if cached is not None and cached[0] == tag
            else self._iterator_for(shard_id, tag)
        )
        while it is not None and len(rows) < self.max_per_shard:
            limit = min(self.get_limit, self.max_per_shard - len(rows))
            try:
                resp = self._call(
                    self.client.get_records, ShardIterator=it, Limit=limit
                )
            except Exception as exc:
                if _error_code(exc) == "ExpiredIteratorException":
                    it = self._iterator_for(shard_id, tag)
                    continue
                raise
            for r in resp.get("Records", []):
                rows.append(
                    (
                        bytes(r["Data"]),
                        shard_id,
                        r["SequenceNumber"],
                        r.get("PartitionKey"),
                    )
                )
                tag = "AFTER:" + r["SequenceNumber"]
            it = resp.get("NextShardIterator")
            if it is None:
                self._live.pop(shard_id, None)
                return rows, "CLOSED"  # shard end reached: drained
            if not resp.get("Records") and not resp.get(
                "MillisBehindLatest", 0
            ):
                break  # caught up; stop polling this micro-batch
        if it is not None:
            self._live[shard_id] = (tag, it)  # chain into the next poll
        return rows, tag

    # -- the consume loop ----------------------------------------------------
    def read(self, start: dict):
        offsets, parents = self._discover(start)
        out_rows: list = []
        next_off = dict(offsets)
        # CASCADE within one poll: the parent-hold check reads the
        # LIVE state (next_off), and the pass loop repeats until no
        # shard changes state — so a child becomes readable in the
        # same poll its parent closes. A single start-state pass (the
        # original shape) walked down only ONE reshard generation per
        # micro-batch: after a split-of-a-split on a quiet stream, a
        # record in the grandchild sat unread for k batches behind k
        # EMPTY closed ancestors, and a drain-until-quiescent consumer
        # (two row-less polls) stopped before ever reaching it — found
        # by the hypothesis interleaving property test
        # (ops=['R','R',put]: drain yielded [] with one record put).
        # Each shard still drains at most once per read(), so the
        # per-shard admission cap stays a PER-POLL cap; per-original-
        # shard ordering is preserved because a child is only released
        # after its parents reached CLOSED in this very poll.
        drained: set[str] = set()
        changed = True
        while changed:
            changed = False
            for shard_id in sorted(next_off):
                tag = next_off[shard_id]
                if tag == "CLOSED" or shard_id in drained:
                    continue
                # a shard in the checkpoint but gone from ListShards
                # has aged out of retention (closed shards disappear
                # from the listing after the retention window):
                # everything it held is unrecoverable from Kinesis, so
                # mark it CLOSED instead of crashing get_shard_iterator
                # forever — the standard aged-shard handling (and what
                # keeps its CHILDREN from being held on a parent that
                # can never drain).
                if shard_id not in parents:
                    next_off[shard_id] = "CLOSED"
                    changed = True
                    continue
                # KCL-style reshard ordering: hold a child while any
                # parent is still open (present and not CLOSED)
                if any(
                    next_off.get(p, "CLOSED") != "CLOSED"
                    for p in parents.get(shard_id, [])
                ):
                    continue
                rows, next_tag = self._drain_shard(shard_id, tag)
                out_rows.extend(rows)
                next_off[shard_id] = next_tag
                drained.add(shard_id)
                if next_tag == "CLOSED":
                    changed = True  # children may be releasable now
        return iter(out_rows), next_off

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        """Deterministic replay of a committed range on recovery: for
        each shard, re-read from the start tag up to and including the
        end tag's sequence number (Kinesis retention makes the data
        re-readable; a range past retention is unrecoverable, as with
        every Kinesis consumer)."""
        for shard_id in sorted(end):
            s_tag = start.get(shard_id, "TRIM_HORIZON")
            e_tag = end[shard_id]
            if s_tag == e_tag:
                continue  # nothing consumed from this shard

            def _aged_out(exc: Exception) -> bool:
                # a shard whose committed range DRAINED it (end tag
                # CLOSED) can age out of retention between the commit
                # and the replay — closed shards vanish from the
                # stream after the retention window, and
                # get_shard_iterator on a vanished shard raises
                # ResourceNotFoundException on EVERY restart, so the
                # query could never recover past that epoch. The data
                # is unrecoverable from Kinesis by definition (as for
                # any consumer); skip the shard, mirroring read()'s
                # aged-shard handling. A non-CLOSED end tag still
                # propagates: there the range was NOT fully consumed
                # and silence would be data loss.
                return (
                    e_tag == "CLOSED"
                    and _error_code(exc) == "ResourceNotFoundException"
                )

            stop_seq = (
                int(e_tag[len("AFTER:"):])
                if e_tag.startswith("AFTER:")
                else None
            )
            try:
                it = self._iterator_for(shard_id, s_tag)
            except Exception as exc:
                if _aged_out(exc):
                    continue
                raise
            tag = s_tag
            while it is not None:
                try:
                    resp = self._call(
                        self.client.get_records,
                        ShardIterator=it,
                        Limit=self.get_limit,
                    )
                except Exception as exc:
                    if _error_code(exc) == "ExpiredIteratorException":
                        try:
                            it = self._iterator_for(shard_id, tag)
                        except Exception as exc2:
                            if _aged_out(exc2):
                                break
                            raise
                        continue
                    if _aged_out(exc):
                        break
                    raise
                done = False
                for r in resp.get("Records", []):
                    seq = r["SequenceNumber"]
                    if stop_seq is not None and int(seq) > stop_seq:
                        done = True
                        break
                    yield (
                        bytes(r["Data"]),
                        shard_id,
                        seq,
                        r.get("PartitionKey"),
                    )
                    tag = "AFTER:" + seq
                    if stop_seq is not None and int(seq) == stop_seq:
                        done = True
                        break
                if done:
                    break
                it = resp.get("NextShardIterator")
                if not resp.get("Records") and not resp.get(
                    "MillisBehindLatest", 0
                ):
                    break

    def commit(self, end: dict) -> None:
        pass  # positions live in Spark's checkpoint


@_dataclass
class _ShardPartition(InputPartition):
    shard_id: str


class KinesisAwsBatchReader(DataSourceReader):
    """Batch mode over a real stream (``spark.read.format(
    "kinesis_aws")``) — the replay/backfill shape the emulator also
    supports: one executor task per shard, each draining its shard
    from the start position until caught up (MillisBehindLatest == 0)
    or shard end, STREAMING each GetRecords page out as it arrives (a
    shard can hold days of retention; buffering it would OOM the
    executor). Executors build their own client via the same factory
    options, so the read is shard-parallel — unlike the streaming
    simple reader, a batch CAN know its end ("now"), which is why
    this mode gets the partitioned treatment.

    Start position: ``startingPosition=TRIM_HORIZON`` (default) or a
    ``startTag=TS:<epoch-seconds>`` bound. ``AFTER:<seq>`` is
    REJECTED here: a sequence number names a position in ONE shard,
    and the same tag applied to every partition would raise
    InvalidArgumentException on real AWS for all the others (use the
    streaming reader's per-shard offset dict for that shape).
    ``LATEST`` is also rejected — a backfill anchored at "now" reads
    nothing by construction."""

    def __init__(self, options: dict) -> None:
        self.options = options
        self.stream_name = options["streamname"]
        tag = options.get(
            "starttag", options.get("startingposition", "TRIM_HORIZON")
        )
        if not tag.startswith("TS:"):
            tag = tag.upper()
        if tag.startswith("AFTER:"):
            raise ValueError(
                "batch startTag AFTER:<seq> is per-shard by nature "
                "(a Kinesis sequence number belongs to one shard); "
                "use TS:<epoch-seconds> or TRIM_HORIZON, or the "
                "streaming reader's per-shard offsets"
            )
        if tag == "LATEST":
            raise ValueError(
                "batch read from LATEST reads nothing by construction;"
                " use TRIM_HORIZON or a TS:<epoch-seconds> bound"
            )
        if tag != "TRIM_HORIZON" and not tag.startswith("TS:"):
            raise ValueError(f"unsupported batch start tag {tag!r}")
        self.start_tag = tag

    def partitions(self) -> list[_ShardPartition]:
        client = _resolve_client_factory(self.options)()
        return [
            _ShardPartition(s["ShardId"])
            for s in _list_all_shards(
                client,
                self.stream_name,
                int(self.options.get("pollbackoffms", 200)),
                int(self.options.get("maxretries", 7)),
            )
        ]

    def read(self, partition: _ShardPartition):
        # page-at-a-time generator over the simple reader's iterator
        # plumbing: constant memory regardless of shard retention
        helper = KinesisAwsSimpleReader(self.options)
        shard_id = partition.shard_id
        tag = self.start_tag
        it = helper._iterator_for(shard_id, tag)
        while it is not None:
            try:
                resp = helper._call(
                    helper.client.get_records,
                    ShardIterator=it,
                    Limit=helper.get_limit,
                )
            except Exception as exc:
                if _error_code(exc) == "ExpiredIteratorException":
                    it = helper._iterator_for(shard_id, tag)
                    continue
                raise
            for r in resp.get("Records", []):
                yield (
                    bytes(r["Data"]),
                    shard_id,
                    r["SequenceNumber"],
                    r.get("PartitionKey"),
                )
                tag = "AFTER:" + r["SequenceNumber"]
            it = resp.get("NextShardIterator")
            if not resp.get("Records") and not resp.get(
                "MillisBehindLatest", 0
            ):
                return  # caught up: the backfill's "now" boundary


class _PutResult(WriterCommitMessage):
    def __init__(self, n: int) -> None:
        self.n = n


class KinesisAwsStreamWriter(DataSourceStreamWriter):
    """PutRecords producer. Input rows: (data binary, partition_key
    string). At-least-once: a retried micro-batch may re-put records
    (Kinesis has no idempotent produce); pair with the keyed upsert
    sink (R15) for effectively-once enrichment."""

    def __init__(self, options: dict) -> None:
        self.stream_name = options["streamname"]
        self.backoff_ms = int(options.get("pollbackoffms", 200))
        self.max_retries = int(options.get("maxretries", 7))
        self._factory = _resolve_client_factory(options)

    def write(self, iterator) -> _PutResult:
        client = self._factory()
        batch: list[dict] = []
        size = 0
        n = 0

        def flush():
            nonlocal batch, size, n
            entries = batch
            batch, size = [], 0
            delay = self.backoff_ms / 1000.0
            for attempt in range(self.max_retries + 1):
                # whole-call throttles (the request itself rejected)
                # back off here; per-record failures below
                resp = _with_backoff(
                    client.put_records,
                    self.backoff_ms,
                    self.max_retries,
                    StreamName=self.stream_name,
                    Records=entries,
                )
                n += len(entries) - resp.get("FailedRecordCount", 0)
                if not resp.get("FailedRecordCount"):
                    return
                # retry ONLY the failed entries (per-record isolation,
                # R16): position i in the response matches entry i
                entries = [
                    e
                    for e, r in zip(entries, resp["Records"])
                    if r.get("ErrorCode")
                ]
                if attempt == self.max_retries:
                    first_err = next(
                        (
                            r["ErrorCode"]
                            for r in resp["Records"]
                            if r.get("ErrorCode")
                        ),
                        None,
                    )
                    raise RuntimeError(
                        f"put_records: {len(entries)} record(s) still "
                        f"failing after {self.max_retries} retries "
                        f"(first error {first_err!r})"
                    )
                _SLEEP(delay)
                delay *= 2

        for row in iterator:
            data = bytes(row.data)
            entry = {
                "Data": data,
                "PartitionKey": row.partition_key or "0",
            }
            esz = len(data) + len(entry["PartitionKey"])
            if batch and (
                len(batch) >= _PUT_MAX_RECORDS
                or size + esz > _PUT_MAX_BYTES
            ):
                flush()
            batch.append(entry)
            size += esz
        if batch:
            flush()
        return _PutResult(n)

    def commit(self, messages, batchId) -> None:  # noqa: N802
        pass  # at-least-once: nothing to finalize

    def abort(self, messages, batchId) -> None:  # noqa: N802
        pass  # puts are not transactional; retried epoch re-puts


class KinesisAwsDataSource(DataSource):
    """``spark.readStream.format("kinesis_aws")`` /
    ``df.writeStream.format("kinesis_aws")`` after
    ``spark.dataSource.register(KinesisAwsDataSource)``.

    Reader options: streamName (required), startingPosition
    (TRIM_HORIZON|LATEST), maxRecordsPerShardPerBatch, getRecordsLimit,
    pollBackoffMs, maxRetries, region, endpointUrl, profile,
    roleArn/policyArn/roleSessionName (scoped STS assume-role with
    auto-refresh — the reference's auth model), clientFactory
    ("module:function" — testing/localstack hook).
    Writer options: streamName (required) + the same client options;
    input rows (data binary, partition_key string)."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_aws"

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType):  # noqa: N802
        return KinesisAwsSimpleReader(self.options)

    def reader(self, schema: StructType) -> KinesisAwsBatchReader:
        return KinesisAwsBatchReader(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool):  # noqa: N802
        return KinesisAwsStreamWriter(self.options)


def consume_offsets_json(offsets: dict) -> str:
    """Stable JSON form of an offset dict (debug/observability)."""
    return json.dumps(offsets, sort_keys=True)
