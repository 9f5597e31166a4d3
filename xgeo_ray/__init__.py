"""xgeo_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimagining of the reference's streaming pipeline model
(StationA/xgeo: pluggable source -> record stream -> per-record transform
-> sink; see /root/reference/cmd/xgeo/main.go:18-62) as a declarative
change-apply engine over Parquet tables of multi-turn conversation
transcripts:

    WAL/changelog segments --read--> ray.data.Dataset of change events
      --map_batches--> normalize / validate / schema-cast (Arrow, zero-copy)
      --map_batches--> within-batch last-writer-wins pre-collapse + salted
                       hash partition key + watermark dedup
      --groupby(part_key).map_groups--> partition-local merge: LWW by
                       (ts, seq), tombstones kept as delta rows, sorted by
                       (conv_id, turn_idx), written as epoch-fenced Parquet
      --manifest commit--> exactly-once, resumable, per-partition lineage

Everything is expressed on the ray.data.Dataset API; raw actors are used
only for the SchemaRegistry (shared mutable union schema).
"""

from xgeo_ray.schemas import CHANGE_EVENTS_SCHEMA, TRANSCRIPTS_SCHEMA

__all__ = ["CHANGE_EVENTS_SCHEMA", "TRANSCRIPTS_SCHEMA"]
__version__ = "0.1.0"
