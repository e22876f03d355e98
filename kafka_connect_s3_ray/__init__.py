"""kafka_connect_s3_ray — a from-scratch, Ray-Data-native CDC ingest engine.

Reimagines the capabilities of the reference (sugarcrm/kafka-connect-s3, a
partition-parallel, offset-tracked Kafka->S3 archive/replay connector pair) as a
changelog-tail -> Parquet-lake upsert pipeline over multi-turn transcript tables:

- ``schema``            Arrow schemas for the lake / change-event / manifest model
- ``synth``             deterministic (seed=42) lake + changelog generator and the
                        single-process replay oracle used by tests
- ``stages``            vectorized map_batches stages: partitioning/salting, filters,
                        the pure-Arrow last-writer-wins merge kernel
- ``state``             checkpoint manifest (per-partition high-watermark + file
                        lineage) and metrics
- ``sources``           changelog readers, import/export codecs (delimited text,
                        length-prefixed binary), block-gzip chunk files
- ``pipelines``         the end-to-end upsert job (incremental + tail mode)
- ``functions``         training-data ops: dedup (exact/minhash/simhash/embedding),
                        similarity search, text analysis, multimodal stubs

Everything here is built on public Ray Data / PyArrow APIs only.
"""

__version__ = "0.1.0"
