"""In-memory Kinesis service — the local-dev/test stand-in for the
production S2/K1 endpoints (reference lib/fakes/fake_kinesis_client.ex, and
the consume leg of lib/trike/kinesis_source.ex:123-169).

Implements the API subset the engine uses with REAL semantics, so tests can
prove the ordered-delivery contract end-to-end without AWS:

  * ``put_record``: md5-ring partition-key → shard mapping, per-shard
    monotonically increasing sequence numbers (zero-padded, string-sortable
    like Kinesis'), and STRICT ``SequenceNumberForOrdering`` validation —
    a put that chains from anything but the key's latest sequence raises,
    which is how a broken sink ledger surfaces in tests. (AWS itself would
    sequence the record after the given number rather than error; strict
    mode turns a silent misordering into a loud failure.)
  * ``get_shard_iterator`` / ``get_records``: TRIM_HORIZON and
    AFTER_SEQUENCE_NUMBER iterators. An iterator is a position token —
    re-polling the SAME token redelivers the same records, which is
    exactly the at-least-once redelivery contract (the reference does not
    advance its iterator when processing fails, kinesis_source.ex:150-169).

``put_record`` has the same signature as the sink's injectable client
(sinks.py), so a StubKinesisService plugs straight into ``KinesisSink``.
"""

from __future__ import annotations

import hashlib
from typing import Any


class StubKinesisService:
    def __init__(self, n_shards: int = 2) -> None:
        self.n_shards = n_shards
        self._shards: list[list[dict[str, str]]] = [[] for _ in range(n_shards)]
        self._next_seq = 0
        self._last_seq_by_key: dict[str, str] = {}

    # -- producer API (sink side) -------------------------------------------

    def _shard_for(self, partition_key: str) -> int:
        # AWS maps md5(partition_key) onto a 128-bit hash-ring split across
        # shards; modulo over the same digest is the honest simplification.
        return int(hashlib.md5(partition_key.encode()).hexdigest(), 16) % self.n_shards

    def put_record(
        self,
        stream: str,
        partition_key: str,
        data: str,
        sequence_number_for_ordering: str | None = None,
    ) -> dict[str, str]:
        expected = self._last_seq_by_key.get(partition_key)
        if sequence_number_for_ordering is not None and sequence_number_for_ordering != expected:
            raise ValueError(
                f"broken ordering chain for key {partition_key!r}: "
                f"got SequenceNumberForOrdering={sequence_number_for_ordering!r}, "
                f"key's latest is {expected!r}"
            )
        seq = f"{self._next_seq:020d}"  # string-sortable, like Kinesis
        self._next_seq += 1
        shard_id = self._shard_for(partition_key)
        self._shards[shard_id].append(
            {"SequenceNumber": seq, "PartitionKey": partition_key, "Data": data}
        )
        self._last_seq_by_key[partition_key] = seq
        return {"SequenceNumber": seq, "ShardId": f"shardId-{shard_id:012d}"}

    # -- consumer API (replay-source side) ----------------------------------

    def list_shards(self, stream: str) -> list[str]:
        return [f"shardId-{i:012d}" for i in range(self.n_shards)]

    def get_shard_iterator(
        self,
        stream: str,
        shard_id: str,
        iterator_type: str,
        starting_sequence_number: str | None = None,
    ) -> dict[str, str]:
        idx = int(shard_id.rsplit("-", 1)[1])
        records = self._shards[idx]
        if iterator_type == "TRIM_HORIZON":
            pos = 0
        elif iterator_type == "AFTER_SEQUENCE_NUMBER":
            if starting_sequence_number is None:
                raise ValueError("AFTER_SEQUENCE_NUMBER needs starting_sequence_number")
            pos = next(
                (
                    i + 1
                    for i, r in enumerate(records)
                    if r["SequenceNumber"] == starting_sequence_number
                ),
                len(records),
            )
        elif iterator_type == "LATEST":
            pos = len(records)
        else:
            raise ValueError(f"unsupported iterator type {iterator_type!r}")
        return {"ShardIterator": f"{idx}:{pos}"}

    def get_records(self, shard_iterator: str, limit: int = 10_000) -> dict[str, Any]:
        idx, pos = (int(x) for x in shard_iterator.split(":"))
        batch = self._shards[idx][pos : pos + limit]
        return {
            "Records": batch,
            "NextShardIterator": f"{idx}:{pos + len(batch)}",
        }


def read_shard_records(
    client: Any,
    stream: str,
    shard_id: str,
    after_seq: str | None = None,
    limit: int = 10_000,
) -> tuple[list[dict[str, str]], str | None]:
    """One at-least-once poll of a shard: returns ``(records, last_seq)``.

    The caller persists ``last_seq`` ONLY after downstream processing
    commits, then passes it back as ``after_seq`` on the next poll. If
    processing fails, re-polling with the PREVIOUS ``after_seq`` redelivers
    the same records — the iterator is derived from the committed position,
    never from the in-flight read (kinesis_source.ex:150-169 keeps its
    iterator un-advanced on failure for the same reason).
    """
    if after_seq is None:
        it = client.get_shard_iterator(stream, shard_id, "TRIM_HORIZON")
    else:
        it = client.get_shard_iterator(
            stream, shard_id, "AFTER_SEQUENCE_NUMBER", starting_sequence_number=after_seq
        )
    resp = client.get_records(it["ShardIterator"], limit)
    records = resp["Records"]
    last = records[-1]["SequenceNumber"] if records else after_seq
    return records, last
