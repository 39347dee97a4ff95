"""In-process stateful fake of the Kinesis API surface ``kinesis_aws``
uses — the shipped test double (the same pattern as Kafka's
MockProducer/MockConsumer living in the client library): offline
environments and CI inject it via the connector's
``clientFactory="arc_kinesis_tagging_spark.streaming.kinesis_testing:\
make_fake_client"`` option, driving the REAL consume/produce loops
against scripted shard topologies, throttles, iterator expiry, and
partial put failures.

Implements exactly the five calls the binding makes: ``list_shards``
(paginated), ``get_shard_iterator``, ``get_records`` (with
NextShardIterator chaining and shard close), ``put_records`` (with
scripted per-record failures), plus test-side mutators for reshard /
throttle / expiry scripting. Sequence numbers are stringified ints,
monotone per shard, like the real service.
"""

from __future__ import annotations

import itertools


class FakeAwsError(Exception):
    """Shape-compatible with botocore's ClientError for the error-code
    extraction the binding does (``response["Error"]["Code"]``)."""

    def __init__(self, code: str, op: str) -> None:
        super().__init__(f"{code} in {op}")
        self.response = {"Error": {"Code": code}}


class FakeKinesisClient:
    def __init__(self, stream_name: str = "test-stream") -> None:
        self.stream_name = stream_name
        # shard_id -> {"records": [(seq:int, data:bytes, pk:str)],
        #              "closed": bool, "parents": [shard_id]}
        self.shards: dict[str, dict] = {}
        self._seq = itertools.count(1)
        self._iter_seq = itertools.count(1)
        # iterator token -> (shard_id, next_index)
        self._iterators: dict[str, tuple[str, int]] = {}
        self.list_page_size = 2  # small page -> pagination exercised
        # scripting hooks
        self.throttle_next: int = 0  # fail N next get_records calls
        self.throttle_next_list: int = 0  # fail N next list_shards calls
        self.expire_tokens: set[str] = set()
        self.fail_put_pks: dict[str, int] = {}  # pk -> remaining fails
        self.calls: list[str] = []
        self.ts_by_seq: dict[int, float] = {}  # arrival ts per record

    # -- test-side mutators --------------------------------------------------
    def add_shard(self, shard_id: str, parents: list[str] | None = None):
        self.shards[shard_id] = {
            "records": [],
            "closed": False,
            "parents": list(parents or []),
        }

    def put(
        self, shard_id: str, data: bytes, pk: str = "0", ts: float | None = None
    ) -> str:
        import time

        seq = next(self._seq)
        self.shards[shard_id]["records"].append((seq, data, pk))
        self.ts_by_seq[seq] = time.time() if ts is None else ts
        return str(seq)

    def close_shard(self, shard_id: str) -> None:
        self.shards[shard_id]["closed"] = True

    def reshard(self, parent: str, children: list[str]) -> None:
        self.close_shard(parent)
        for c in children:
            self.add_shard(c, parents=[parent])

    # -- the API surface -------------------------------------------------
    def list_shards(self, **kw):
        self.calls.append("list_shards")
        if self.throttle_next_list > 0:
            # ListShards throttles with LimitExceededException (it is
            # the lowest-TPS Kinesis API), unlike get_records'
            # ProvisionedThroughputExceededException
            self.throttle_next_list -= 1
            raise FakeAwsError("LimitExceededException", "list_shards")
        ids = sorted(self.shards)
        start = int(kw["NextToken"]) if kw.get("NextToken") else 0
        page = ids[start : start + self.list_page_size]
        out = {
            "Shards": [
                {
                    "ShardId": sid,
                    **(
                        {"ParentShardId": self.shards[sid]["parents"][0]}
                        if self.shards[sid]["parents"]
                        else {}
                    ),
                }
                for sid in page
            ]
        }
        if start + self.list_page_size < len(ids):
            out["NextToken"] = str(start + self.list_page_size)
        return out

    def get_shard_iterator(self, **kw):
        self.calls.append("get_shard_iterator")
        if kw["ShardId"] not in self.shards:
            # real Kinesis: a shard aged out of retention is gone from
            # the stream and get_shard_iterator raises
            raise FakeAwsError(
                "ResourceNotFoundException", "get_shard_iterator"
            )
        shard = self.shards[kw["ShardId"]]
        typ = kw["ShardIteratorType"]
        if typ == "TRIM_HORIZON":
            idx = 0
        elif typ == "LATEST":
            idx = len(shard["records"])
        elif typ == "AT_TIMESTAMP":
            t = kw["Timestamp"]
            t = t.timestamp() if hasattr(t, "timestamp") else float(t)
            idx = len(shard["records"])
            for i, (seq, _, _) in enumerate(shard["records"]):
                if self.ts_by_seq.get(seq, 0.0) >= t:
                    idx = i
                    break
        elif typ == "AFTER_SEQUENCE_NUMBER":
            after = int(kw["StartingSequenceNumber"])
            idx = 0
            for i, (seq, _, _) in enumerate(shard["records"]):
                if seq <= after:
                    idx = i + 1
        else:
            raise FakeAwsError("ValidationException", "get_shard_iterator")
        tok = f"it-{next(self._iter_seq)}"
        self._iterators[tok] = (kw["ShardId"], idx)
        return {"ShardIterator": tok}

    def get_records(self, **kw):
        self.calls.append("get_records")
        if self.throttle_next > 0:
            self.throttle_next -= 1
            raise FakeAwsError(
                "ProvisionedThroughputExceededException", "get_records"
            )
        tok = kw["ShardIterator"]
        if tok in self.expire_tokens:
            self.expire_tokens.discard(tok)
            raise FakeAwsError("ExpiredIteratorException", "get_records")
        shard_id, idx = self._iterators.pop(tok)
        shard = self.shards[shard_id]
        limit = kw.get("Limit", 10000)
        recs = shard["records"][idx : idx + limit]
        new_idx = idx + len(recs)
        behind = len(shard["records"]) - new_idx
        out = {
            "Records": [
                {
                    "SequenceNumber": str(seq),
                    "Data": data,
                    "PartitionKey": pk,
                }
                for seq, data, pk in recs
            ],
            "MillisBehindLatest": behind,
        }
        if shard["closed"] and new_idx >= len(shard["records"]):
            out["NextShardIterator"] = None  # shard end: drained
        else:
            nxt = f"it-{next(self._iter_seq)}"
            self._iterators[nxt] = (shard_id, new_idx)
            out["NextShardIterator"] = nxt
        return out

    def put_records(self, **kw):
        self.calls.append("put_records")
        results = []
        failed = 0
        n_open = max(
            1, sum(1 for s in self.shards.values() if not s["closed"])
        )
        for e in kw["Records"]:
            pk = e["PartitionKey"]
            if self.fail_put_pks.get(pk, 0) > 0:
                self.fail_put_pks[pk] -= 1
                failed += 1
                results.append(
                    {
                        "ErrorCode": "ProvisionedThroughputExceededException",
                        "ErrorMessage": "scripted",
                    }
                )
                continue
            sid = sorted(
                s for s, v in self.shards.items() if not v["closed"]
            )[hash(pk) % n_open]
            seq = self.put(sid, bytes(e["Data"]), pk)
            results.append({"SequenceNumber": seq, "ShardId": sid})
        return {"FailedRecordCount": failed, "Records": results}


_SINGLETON: FakeKinesisClient | None = None


def make_fake_client() -> FakeKinesisClient:
    """clientFactory hook: returns a process-wide singleton so a test
    can script the topology, hand the factory path to the connector,
    and inspect the same instance afterwards."""
    global _SINGLETON
    if _SINGLETON is None:
        _SINGLETON = FakeKinesisClient()
    return _SINGLETON


def reset_fake_client() -> FakeKinesisClient:
    global _SINGLETON
    _SINGLETON = FakeKinesisClient()
    return _SINGLETON


SEED_PATH = "/tmp/akt_fake_kinesis_seed.json"


def make_file_seeded_client() -> FakeKinesisClient:
    """clientFactory hook for CROSS-PROCESS wiring tests: Spark runs a
    Python data source's simple stream reader in its own Python worker,
    where the test process's singleton is invisible — so this factory
    rebuilds the fake from a JSON seed file the test wrote
    (``{"shards": {shard_id: [[base64_data, pk], ...]}}``). One fake
    per process, seeded once; read positions then live in the stream's
    offsets, not in fake state, so re-creation is harmless."""
    import base64
    import json

    c = make_fake_client()
    if not c.shards:
        with open(SEED_PATH) as fh:
            seed = json.load(fh)
        for sid, recs in sorted(seed["shards"].items()):
            c.add_shard(sid)
            for data_b64, pk in recs:
                c.put(sid, base64.b64decode(data_b64), pk)
    return c
