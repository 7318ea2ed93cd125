"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (north-star §multimodal): image/audio/video travel as `binary`
columns; decode / feature-extract run as Arrow-batched pandas functions via
``mapInPandas`` so each task processes whole record batches.  The actual
codec work is STUBBED (no image/audio libraries in this environment) behind
``decode_stub`` — a deterministic fake with the same schema/partitioning/
batch shape the real decoder would have; swap ``_decode_payload`` for a real
implementation (PIL/librosa/ffmpeg) without touching the Spark plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_binary_payload(df: DataFrame, text_col: str = 'text',
                          id_col: str = 'doc_id') -> DataFrame:
    """Demo payload builder: utf-8 bytes of the text as the opaque blob, plus
    typed metadata (media_type, byte length) — the shape a real ingest of
    image/audio files would produce."""
    payload = F.encode(F.col(text_col), 'utf-8')
    return df.select(
        F.col(id_col),
        payload.alias('payload'),
        F.lit('application/octet-stream').alias('media_type'),
        F.length(payload).alias('n_bytes'),
    )


_FEATURE_SCHEMA = T.StructType([
    T.StructField('doc_id', T.LongType()),
    T.StructField('n_bytes', T.LongType()),
    T.StructField('byte_checksum', T.LongType()),
    T.StructField('head_hex', T.StringType()),
    T.StructField('feature', T.ArrayType(T.DoubleType())),
])


def _decode_payload(raw: bytes) -> dict:
    """STUB decoder — deterministic fake features.

    A real implementation would, e.g., PIL-open an image and emit
    (width, height, channel histograms).  This is where it would live:

        raise NotImplementedError('image decode requires PIL')

    The deterministic fake keeps the pipeline testable end-to-end.
    """
    checksum = sum(raw) % (1 << 31)
    head = raw[:4].hex()
    feature = [float(b) / 255.0 for b in raw[:8]]
    feature += [0.0] * (8 - len(feature))
    return {'byte_checksum': checksum, 'head_hex': head, 'feature': feature}


def extract_features(df: DataFrame, payload_col: str = 'payload',
                     id_col: str = 'doc_id', batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Partitioning note: upstream should `repartition` by size (not count) when
    payloads are large — `spark.sql.files.maxPartitionBytes` governs scan
    splits; for 100 TB of media keep partitions ≲ 512 MB of payload.
    """
    id_name, payload_name = id_col, payload_col

    def run(batches):
        import pandas as pd
        for pdf in batches:
            out = {
                'doc_id': [], 'n_bytes': [], 'byte_checksum': [],
                'head_hex': [], 'feature': [],
            }
            for doc_id, raw in zip(pdf[id_name], pdf[payload_name]):
                raw = bytes(raw) if raw is not None else b''
                feats = _decode_payload(raw)
                out['doc_id'].append(int(doc_id))
                out['n_bytes'].append(len(raw))
                out['byte_checksum'].append(feats['byte_checksum'])
                out['head_hex'].append(feats['head_hex'])
                out['feature'].append(feats['feature'])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def multimodal_pipeline(df: DataFrame, text_col: str = 'text',
                        id_col: str = 'doc_id') -> DataFrame:
    """documents → binary payloads → stub decode → typed features."""
    from .dedup import spread_partitions
    payloads = attach_binary_payload(spread_partitions(df), text_col, id_col)
    return extract_features(payloads).orderBy('doc_id')


_FRAME_SCHEMA = ('doc_id long, frame_idx long, frame_offset long, '
                 'frame_len long, frame_checksum long')


def sample_frames(df: DataFrame, frame_size: int = 64, stride: int = 4,
                  max_frames: int = 8, payload_col: str = 'payload',
                  id_col: str = 'doc_id') -> DataFrame:
    """Frame sampling over a binary "video" column: one OUTPUT ROW per
    sampled frame (a row-multiplying mapInPandas — the UDTF shape a real
    video pipeline needs).

    The payload is treated as consecutive `frame_size`-byte frames; every
    `stride`-th frame is sampled, capped at `max_frames` per document.  The
    per-frame work is STUBBED as byte math (offset/length/checksum) — a
    real decoder would emit pixel tensors here — but the Spark plumbing
    (batch iteration, row explosion, output schema) is exactly what the
    real thing uses.  All outputs are pure byte functions so the DuckDB
    oracle replays them value-for-value.

    Scale shape: no shuffle — frames are emitted inside the scan tasks;
    one output row per ~frame_size input bytes bounds the expansion factor.
    """
    id_name, payload_name = id_col, payload_col
    fsz, stp, cap = int(frame_size), int(stride), int(max_frames)

    def run(batches):
        import pandas as pd
        for pdf in batches:
            out = {'doc_id': [], 'frame_idx': [], 'frame_offset': [],
                   'frame_len': [], 'frame_checksum': []}
            for doc_id, raw in zip(pdf[id_name], pdf[payload_name]):
                raw = bytes(raw) if raw is not None else b''
                n = len(raw)
                n_frames = -(-n // fsz)  # ceil; 0 bytes → no frames
                for fi in list(range(0, n_frames, stp))[:cap]:
                    off = fi * fsz
                    chunk = raw[off:off + fsz]
                    out['doc_id'].append(int(doc_id))
                    out['frame_idx'].append(fi)
                    out['frame_offset'].append(off)
                    out['frame_len'].append(len(chunk))
                    out['frame_checksum'].append(sum(chunk) % (1 << 31))
            yield pd.DataFrame(out, columns=list(out))

    return df.mapInPandas(run, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = ('doc_id long, orig_bytes long, resized_bytes long, '
                  'resized_checksum long, resized_head_hex string')


def resize_stub(df: DataFrame, factor: int = 4, payload_col: str = 'payload',
                id_col: str = 'doc_id') -> DataFrame:
    """Resize plumbing over a binary column: 1:1 mapInPandas that shrinks
    each payload by keeping every `factor`-th byte (the stub stand-in for a
    real image resample) and emits the resized metadata.

    Deterministic byte math end-to-end — the oracle reproduces checksum and
    head bytes from hex arithmetic.  No shuffle; runs inside scan tasks.
    """
    id_name, payload_name = id_col, payload_col
    k = int(factor)

    def run(batches):
        import pandas as pd
        for pdf in batches:
            out = {'doc_id': [], 'orig_bytes': [], 'resized_bytes': [],
                   'resized_checksum': [], 'resized_head_hex': []}
            for doc_id, raw in zip(pdf[id_name], pdf[payload_name]):
                raw = bytes(raw) if raw is not None else b''
                small = raw[::k]
                out['doc_id'].append(int(doc_id))
                out['orig_bytes'].append(len(raw))
                out['resized_bytes'].append(len(small))
                out['resized_checksum'].append(sum(small) % (1 << 31))
                out['resized_head_hex'].append(small[:4].hex())
            yield pd.DataFrame(out, columns=list(out))

    return df.mapInPandas(run, schema=_RESIZE_SCHEMA)
