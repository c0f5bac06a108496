"""Multimodal column plumbing: image/audio/video as opaque binary.

Design: media travel as ``binary`` columns with a typed metadata
struct alongside (modality, byte length, content hash, declared dims).
The Spark-side plumbing — schema, Arrow batch shape, partitioning —
is real and tested; the actual codec step is stubbed (no image/audio
libraries in this container) behind ``decode_stub``: a clearly-marked
``NotImplementedError`` with a deterministic-fake fallback so
pipelines exercise the full path.

At scale: binary payloads dominate partition size — size
``spark.sql.files.maxPartitionBytes`` down (or repartition by a
bucketed key) so one Arrow batch of decoded frames fits executor
memory; never collect payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "modality string, n_bytes bigint, sha256 string"

try:  # pragma: no cover - absent in this container; probe documents the seam
    from PIL import Image as _PILImage  # noqa: N813

    CODEC_AVAILABLE = True
except ImportError:
    _PILImage = None
    CODEC_AVAILABLE = False


def attach_fake_binary(df: DataFrame, text_col: str, modality: str = "image") -> DataFrame:
    """Deterministic fake payload: the UTF-8 bytes of a text column.

    Stands in for real media bytes so the binary plumbing (hashing,
    batching, decode stubs) runs end-to-end in this container.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "modality", F.lit(modality)
    )


def payload_meta(payload: Column, modality: Column) -> Column:
    """Typed metadata struct for an opaque binary column — native
    expressions (codegen), no UDF."""
    return F.struct(
        modality.alias("modality"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_stub(payload: bytes, modality: str) -> dict:
    """CODEC STUB — the real implementation needs PIL/ffmpeg/librosa,
    which are not in this container.

    Deterministic fake: 'decodes' to a pseudo shape derived from the
    byte length so downstream operators (resize, frame-sample) have
    stable inputs. Raise instead when strictness is required.
    """
    if modality not in {"image", "audio", "video"}:
        raise NotImplementedError(f"unknown modality: {modality}")
    n = len(payload)
    if modality == "image":
        side = max(1, int(n**0.5))
        return {"height": side, "width": side, "channels": 3}
    if modality == "audio":
        return {"sample_rate": 16000, "n_samples": n * 4}
    return {"fps": 25, "n_frames": max(1, n // 100)}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png_header(payload: bytes, modality: str = "image") -> dict:
    """Vendored pure-stdlib PNG dimension decode: signature + IHDR.

    The PNG container puts IHDR first with fixed layout (width, height,
    bit depth, color type — RFC 2083 §4.1.1), so REAL dimensions of any
    real PNG are readable with ``struct`` alone, no codec library.
    Raises ValueError for non-PNG payloads (callers fall back to the
    stub); pixel decode still needs a real codec (``CODEC_AVAILABLE``).
    """
    import struct

    if modality != "image":
        raise ValueError(f"PNG decoder got modality {modality!r}")
    if len(payload) < 26 or bytes(payload[:8]) != _PNG_SIG:
        raise ValueError("not a PNG payload")
    length, ctype = struct.unpack(">I4s", bytes(payload[8:16]))
    if ctype != b"IHDR" or length != 13:
        raise ValueError("malformed PNG: IHDR chunk not first")
    w, h, _bit_depth, color_type = struct.unpack(">IIBB", bytes(payload[16:26]))
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color_type}")
    return {"height": h, "width": w, "channels": channels}


def decode_jpeg_header(payload: bytes, modality: str = "image") -> dict:
    """Vendored pure-stdlib JPEG dimension decode: marker walk to SOF.

    JPEG frame dimensions live in the Start-Of-Frame segment (SOF0-15,
    ITU T.81 §B.2.2: precision, height, width, component count), which
    precedes the entropy-coded scan data — so REAL dimensions of any
    real baseline/progressive JPEG are readable by walking the marker
    segments with ``struct`` alone, no codec library. Raises ValueError
    for non-JPEG payloads (callers fall back to the stub); pixel decode
    still needs a real codec (``CODEC_AVAILABLE``).
    """
    import struct

    if modality != "image":
        raise ValueError(f"JPEG decoder got modality {modality!r}")
    b = bytes(payload)
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("malformed JPEG: lost marker sync")
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
            break
        (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
        if seglen < 2:
            raise ValueError("malformed JPEG: bad segment length")
        # SOF0-SOF15 minus the non-frame C-block markers DHT/JPG/DAC
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 10 > len(b):
                raise ValueError("malformed JPEG: truncated SOF")
            _prec, h, w, ncomp = struct.unpack(">BHHB", b[i + 4 : i + 10])
            return {"height": h, "width": w, "channels": ncomp}
        i += 2 + seglen
    raise ValueError("no SOF marker found")


def decode_wav_header(payload: bytes, modality: str = "audio") -> dict:
    """Vendored pure-stdlib WAV metadata decode: RIFF chunk walk.

    Sample rate and channel count live in the ``fmt `` chunk (RIFF
    WAVE, fixed little-endian layout) and the sample count derives
    from the ``data`` chunk's byte length / block align — both precede
    the audio payload, so REAL audio metadata of any PCM WAV is
    readable with ``struct`` alone, the audio sibling of the PNG/JPEG
    header parses. Raises ValueError for non-WAV payloads (callers
    fall back to the stub); sample decode still needs a real codec.
    """
    import struct

    if modality != "audio":
        raise ValueError(f"WAV decoder got modality {modality!r}")
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i = 12
    rate = n_channels = block_align = None
    n_samples = 0
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt ":
            if i + 24 > len(b):
                raise ValueError("malformed WAV: truncated fmt chunk")
            _fmt, n_channels, rate, _bps, block_align = struct.unpack(
                "<HHIIH", b[i + 8 : i + 22]
            )
        elif cid == b"data":
            if not block_align:
                raise ValueError("malformed WAV: data before fmt")
            n_samples = clen // block_align
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None:
        raise ValueError("no fmt chunk found")
    return {
        "sample_rate": rate,
        "n_samples": n_samples,
        "channels": n_channels,
    }


def decode_audio(payload: bytes, modality: str = "audio") -> dict:
    """Real audio metadata when the payload is a WAV (header parse —
    no codec library needed), else the deterministic stub. Pass as
    ``decoder=`` to extract_features; the Arrow plumbing is identical
    either way (the image seam's pattern)."""
    try:
        return decode_wav_header(payload, modality)
    except ValueError:
        return decode_stub(payload, modality)


def decode_image(payload: bytes, modality: str = "image") -> dict:
    """Real image decode: Pillow when importable (``CODEC_AVAILABLE``),
    else the vendored PNG/JPEG header parses for real image bytes,
    else the deterministic stub. Pass as ``decoder=`` to
    extract_features / resize_images — the Arrow plumbing is identical
    either way."""
    if not CODEC_AVAILABLE:
        for parse in (decode_png_header, decode_jpeg_header):
            try:
                return parse(payload, modality)
            except ValueError:
                continue
        return decode_stub(payload, modality)
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        return {
            "height": im.height,
            "width": im.width,
            "channels": len(im.getbands()),
        }


def extract_features(
    df: DataFrame, payload_col: str = "payload", decoder=decode_stub
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` — the pattern a real decoder drops into: iterate
    Arrow batches, run the codec per row *inside the executor*, emit a
    flat feature frame. Pass ``decoder=decode_image`` (or any
    ``(bytes, modality) -> dict``) and nothing else changes.
    """
    fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
        + ", n_bytes bigint, feat_a bigint, feat_b bigint"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            modality = pdf["modality"] if "modality" in pdf else None
            # NULL payload -> row kept, NULL features (the curation
            # NULL-row invariant; a kernel must never see None)
            decoded = [
                None
                if p is None
                else decoder(bytes(p), modality.iloc[i] if modality is not None else "image")
                for i, p in enumerate(payloads)
            ]
            out = pdf.drop(columns=[payload_col]).copy()
            out["n_bytes"] = [None if p is None else len(bytes(p)) for p in payloads]
            out["feat_a"] = [None if d is None else d.get("height", d.get("sample_rate", d.get("fps", 0))) for d in decoded]
            out["feat_b"] = [None if d is None else d.get("width", d.get("n_samples", d.get("n_frames", 0))) for d in decoded]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_h: int,
    target_w: int,
    payload_col: str = "payload",
    decoder=decode_stub,
) -> DataFrame:
    """Arrow-batched image resize (stubbed codec by default).

    Pass ``decoder=decode_image`` when Pillow is present for real
    source dims. The geometry math — output dims, aspect-aware scale
    factor — is real either way, so the plumbing (batch shape, schema,
    per-row compute placement) is fully exercised and oracle-checkable.
    """
    id_fields = [f.name for f in df.schema.fields if f.name != payload_col]
    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != payload_col
        )
        + ", src_h bigint, src_w bigint, out_h bigint, out_w bigint, scale double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload -> row kept, NULL geometry (NULL-row
            # invariant; the kernel must never see None)
            decoded = [
                None if p is None else decoder(bytes(p), "image")
                for p in pdf[payload_col]
            ]
            out = pdf[id_fields].copy()
            out["src_h"] = [None if d is None else d["height"] for d in decoded]
            out["src_w"] = [None if d is None else d["width"] for d in decoded]
            # fit-inside scaling, aspect preserved
            scales = [
                None
                if d is None
                else min(target_h / d["height"], target_w / d["width"])
                for d in decoded
            ]
            out["out_h"] = [None if s is None else max(1, int(d["height"] * s)) for d, s in zip(decoded, scales)]
            out["out_w"] = [None if s is None else max(1, int(d["width"] * s)) for d, s in zip(decoded, scales)]
            out["scale"] = [None if s is None else round(s, 9) for s in scales]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame, every: int = 4, payload_col: str = "payload", decoder=decode_stub
) -> DataFrame:
    """Frame sampling for video payloads: one output row per kept
    frame (every ``every``-th), exploded executor-side.

    Output cardinality = Σ ceil(n_frames/every) — never collected to
    the driver; at scale, partition count follows the input and the
    explode is pipelined (no shuffle). ``decoder`` follows
    extract_features/resize_images: any ``(bytes, modality) -> dict``
    returning ``n_frames`` drops in for the stub.
    """
    id_fields = [f.name for f in df.schema.fields if f.name != payload_col]
    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != payload_col
        )
        + ", frame_idx bigint, n_frames bigint"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in enumerate(pdf[payload_col]):
                if p is None:
                    # NULL payload: nothing to sample — zero frames,
                    # the same shape the oracle's inner unnest gives
                    continue
                d = decoder(bytes(p), "video")
                base = {k: pdf[k].iloc[i] for k in id_fields}
                for idx in range(0, d["n_frames"], every):
                    rows.append({**base, "frame_idx": idx, "n_frames": d["n_frames"]})
            yield pd.DataFrame(
                rows, columns=id_fields + ["frame_idx", "n_frames"]
            ) if rows else pd.DataFrame(columns=id_fields + ["frame_idx", "n_frames"])

    return df.mapInPandas(run, schema=out_schema)


# ---- perceptual fingerprinting (media near-dup) --------------------------

DHASH_CELLS_PER_ROW = 9  # 8 bits per row come from adjacent-cell compares
DHASH_ROWS = 8
_DHASH_N_CELLS = DHASH_ROWS * DHASH_CELLS_PER_ROW  # 72
_DHASH_CHUNKS = 4  # 64 bits as 4x16-bit ints (dedup.chunked layout)


def dhash_kernel(payload: bytes) -> list | None:
    """The dHash (difference hash) kernel over one payload's bytes —
    the standard perceptual image fingerprint (an 8×9 grayscale
    downsample; each bit records whether a cell is brighter than its
    right neighbor), computed here over the byte stream the codec
    seam yields: with a real decoder the input is the 8×9-pooled
    pixel grid; with the stub the "pixels" are the payload bytes
    pooled into 72 equal slices. The hashing/compare logic is the
    real algorithm either way, and every comparison is exact integer
    arithmetic (cross-multiplied slice sums — no float averages), so
    an engine-independent oracle recomputes identical bits.

    Returns the 64-bit fingerprint as 4×16-bit chunk ints (the
    ``dedup.chunked_hamming_pairs`` layout), or None for payloads
    under 72 bytes (too small to fingerprint)."""
    n = len(payload)
    if n < _DHASH_N_CELLS:
        return None
    # integer cell sums over 72 equal byte slices
    sums = []
    cnts = []
    for i in range(_DHASH_N_CELLS):
        a = i * n // _DHASH_N_CELLS
        b = (i + 1) * n // _DHASH_N_CELLS
        sums.append(sum(payload[a:b]))
        cnts.append(b - a)
    bits = []
    for r in range(DHASH_ROWS):
        for c in range(DHASH_CELLS_PER_ROW - 1):
            i = r * DHASH_CELLS_PER_ROW + c
            # avg(cell i) > avg(cell i+1), cross-multiplied (exact)
            bits.append(1 if sums[i] * cnts[i + 1] > sums[i + 1] * cnts[i] else 0)
    return [
        int("".join(map(str, bits[k * 16:(k + 1) * 16])), 2)
        for k in range(_DHASH_CHUNKS)
    ]


def image_dhash(
    df: DataFrame, payload_col: str = "payload", sig_col: str = "_sh"
) -> DataFrame:
    """Arrow-batched perceptual fingerprints: one ``sig_col`` column
    (4×16-bit chunk ints, NULL for sub-72-byte payloads) appended per
    row. The per-row kernel runs executor-side inside the Arrow batch
    loop — the placement a real pixel decoder drops into."""
    fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
        + f", {sig_col} array<int>"
    )
    keep = [f.name for f in fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            # NULL payloads pass through as NULL signatures (the
            # repo-wide NULL-row invariant; bytes(None) would raise
            # executor-side)
            out[sig_col] = [
                None if p is None else dhash_kernel(bytes(p))
                for p in pdf[payload_col]
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def phash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
) -> DataFrame:
    """Perceptual near-duplicate pairs over binary media payloads —
    the LAION-style image-dedup shape: dHash fingerprints
    (:func:`image_dhash`), then the shared chunk-pigeonhole Hamming
    join (``dedup.chunked_hamming_pairs`` — equi-join on 16-bit
    chunks, exact chunk-wise verify, never a cross join).

    Candidate-set contract: the output is "pairs sharing ≥1 exact
    16-bit chunk, with exact Hamming ≤ max_hamming". Recall is
    pigeonhole-GUARANTEED only for ``max_hamming ≤ 3`` (chunks−1);
    wider radii (the stubbed-codec query runs 20) keep exact
    precision but can miss a pair whose differing bits spread across
    all 4 chunks — the guaranteed alternative would need
    max_hamming+1 blocks of ~3 bits, whose 8-value equi-join
    degenerates past a cross join. Real-image dHash radii sit ≤ 6;
    callers at radius ≤ 3 get total recall as-is, and the text
    SimHash path shows the n_blocks re-blocking to reach ≤ 6.

    Payloads under 72 bytes carry no fingerprint and produce no
    pairs. At 100 TB the fingerprint pass is payload-local (no
    shuffle) and the join shuffles 4 small (chunk, value) keys per
    item, exactly the SimHash posture."""
    from .dedup import chunked_hamming_pairs

    sig = image_dhash(
        df.select(id_col, payload_col), payload_col, "_sh"
    ).where(F.col("_sh").isNotNull())
    return chunked_hamming_pairs(sig, id_col, "_sh", max_hamming)
