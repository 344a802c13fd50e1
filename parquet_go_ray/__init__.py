"""parquet_go_ray — a Ray-Data-native per-column lightweight-compression engine.

Built from scratch (NOT a port) with the codec capabilities of the reference
parquet-go library (see SURVEY.md): dictionary encoding with hash symbol
tables, RLE/bit-packed hybrid streams, delta-binary-packed integers,
delta-length / delta(prefix) byte arrays, boolean RLE, plain encodings,
plus engine-new FSST string compression and frame-of-reference bit-packing,
selected per column per partition by a sampled-statistics auto-selector.

Execution is Ray Data streaming: ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches, stateful encoder actor pools via ``map_batches``,
salted ``conv_id`` repartitioning for skew, and a per-partition lineage
manifest for checkpoint/resume.
"""

__version__ = "0.1.0"
