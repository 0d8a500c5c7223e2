"""Audio near-duplicate detection — Haitsma–Kalker spectral fingerprints +
hamming-band blocking: the audio-modality member of the dedup family
(pHash covers images/video frames; this covers audio tracks, completing the
multimodal trio).

Fingerprint (Haitsma & Kalker 2002, the Philips audio fingerprint): frame
the waveform into overlapped windows, FFT each, pool the magnitude spectrum
into ``N_BANDS+1`` log-spaced energy bands, then take the SIGN of the
band-difference-of-time-difference:

    bit(n, m) = 1  iff  (E(n,m) − E(n,m+1)) − (E(n−1,m) − E(n−1,m+1)) > 0

— a 64-bit subfingerprint per frame (65 bands → 64 differences), robust to
level/EQ changes because only energy ORDER between adjacent bands and
frames matters. Track-level near-dup then reuses the EXACT machinery built
for video: per-frame 64-bit hashes → ``image_dedup.hamming_pairs`` band
join → ``rollup_frame_pairs`` to (track_a, track_b, n_shared_frames).

Sample source: real codecs are not in this container, so PCM comes from a
real decoder when importable and otherwise from the synthetic ``FAKEAUDIO:``
payload, tiled byte-for-byte into a fixed-length waveform — DETERMINISTIC
and LOCALITY-PRESERVING (a small payload edit perturbs the spectrum
slightly, so the fake behaves like real audio under the fingerprint:
near-identical payloads → small hamming distance, unrelated payloads →
~32 bits). The Spark-side plumbing — Arrow map, schema, NULL/error rows,
band join, rollup — is real and tested either way.

Scale shape: the fingerprint pass is map-only Arrow batches (one FFT set
per track — no shuffle); the band join is ONE linear shuffle on
(band, bkey); the rollup aggregates output-sized frame-pair rows. Never an
all-pairs join. Reference parity: the reference repo has no audio path at
all (photo_vector_search.py handles images only) — this extends the same
store/dedup surface to the third modality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FAKE_PREFIX = b"FAKEAUDIO:"
WINDOW = 2048  # FFT frame
HOP = 1024  # 50% overlap
# Sign-rule epsilon as a fraction of the track's total spectral energy:
# a difference-of-differences within float noise of ZERO has a sign that
# any FFT-implementation change (summation order, SIMD width) could flip —
# below REL_EPS·energy the bit is a deterministic 0. The margin sits ~6
# orders above accumulated FFT noise (~1e-15 relative) yet far below even
# leakage-band energy differences (~1e-6 relative), so genuinely computed
# signs — including the low-band leakage structure that feeds the banding
# entropy — keep their values deterministically. (1e-6 here zeroed the
# leakage bands wholesale and skewed the hamming band buckets ~3x —
# measured, reverted.)
REL_EPS = 1e-9
N_BANDS = 65  # 65 log-spaced energy bands -> 64-bit subfingerprint
SAMPLES_PER_BYTE = 64  # fake synthesis: one 64-sample "note" per payload byte
MIN_NOTES = 48  # >= WINDOW + HOP samples -> at least one subfingerprint
MAX_NOTES = 512  # bound the per-track FFT work (like FAKEIMG's 32x32 tile)


def _band_edges():
    """Strictly-increasing log-spaced band edges over the usable rfft bins
    [1, WINDOW//2]: log-rounding merges adjacent low bins, so bump forward
    to restore strict monotonicity, then clamp back from the top so no edge
    exceeds the spectrum. N_BANDS+1 edges -> N_BANDS non-empty bands."""
    import numpy as np

    lo, hi = 1, WINDOW // 2
    edges = np.round(
        np.exp(np.linspace(np.log(lo), np.log(hi), N_BANDS + 1))
    ).astype(int)
    for i in range(1, N_BANDS + 1):
        edges[i] = max(edges[i], edges[i - 1] + 1)
    for i in range(N_BANDS, -1, -1):
        cap = hi - (N_BANDS - i)
        if edges[i] > cap:
            edges[i] = cap
    return edges


def _samples(content: bytes):
    """Float waveform from audio bytes (real decoder when the bytes are a
    real container and a codec is importable; FAKEAUDIO synthesis
    otherwise). None = undecodable.

    Fake synthesis: each payload byte becomes a ``SAMPLES_PER_BYTE``-sample
    sinusoid "note" whose frequency is byte-dependent. Straight byte TILING
    (the FAKEIMG trick) is WRONG here: a tiling period dividing ``HOP``
    makes every FFT frame identical, all frame-to-frame differences vanish,
    and every track fingerprints to all-zeros. Notes give the waveform real
    temporal structure — adjacent frames see different byte runs, a one-byte
    edit perturbs only the ~3 subfingerprints whose windows cover that note,
    and unrelated payloads differ in ~half the bits. Payloads shorter than
    ``MIN_NOTES`` bytes are read cyclically; bytes past ``MAX_NOTES`` don't
    affect the fingerprint (bounded per-track work, like FAKEIMG's 32x32)."""
    import numpy as np

    content = content or b""
    if content.startswith(_FAKE_PREFIX):
        payload = content[len(_FAKE_PREFIX) :]
        if not payload:
            payload = b"\x00"
        n_notes = min(max(len(payload), MIN_NOTES), MAX_NOTES)
        idx = np.arange(n_notes) % len(payload)
        notes = np.frombuffer(payload, dtype=np.uint8)[idx].astype(np.float64)
        # byte b -> frequency such that the note's energy lands in FFT bin
        # ~ (2 + b/10) * WINDOW/SAMPLES_PER_BYTE = [64, 944] of the window
        # (kept below the Nyquist bin 1024 so no fold-back collisions)
        freqs = 2.0 + notes / 10.0
        t = np.arange(SAMPLES_PER_BYTE) / SAMPLES_PER_BYTE
        return (np.sin(2.0 * np.pi * freqs[:, None] * t[None, :])).ravel()
    try:  # real path: soundfile/librosa when present (not in this container)
        import io

        import soundfile  # noqa: F401

        data, _sr = soundfile.read(io.BytesIO(content))
        data = np.asarray(data, dtype=np.float64)
        if data.ndim > 1:
            data = data.mean(axis=1)
        need = WINDOW + HOP
        if len(data) < need:
            data = np.pad(data, (0, need - len(data)))
        return data[: MAX_NOTES * SAMPLES_PER_BYTE]
    except Exception:
        return None


def _band_energies(samples):
    """(n_frames, N_BANDS) band-energy matrix of the framed spectrum.
    Fully vectorized — this runs once per TRACK inside the corpus-sized
    Arrow pass, so all frames FFT as one batched rfft and the log-band
    pooling is a single ``reduceat`` (a per-band Python loop here would be
    the dominant cost of the whole operator at scale)."""
    import numpy as np

    edges = _band_edges()
    n_frames = (len(samples) - WINDOW) // HOP + 1
    idx = np.arange(WINDOW)[None, :] + HOP * np.arange(n_frames)[:, None]
    segs = samples[idx] * np.hanning(WINDOW)[None, :]
    mag = np.abs(np.fft.rfft(segs, axis=1)) ** 2
    # trim to the top edge so the last reduceat slice is [edges[-2], edges[-1])
    return np.add.reduceat(mag[:, : edges[-1]], edges[:-1], axis=1)


def audio_fingerprint_bytes(content: bytes) -> list[int] | None:
    """Per-frame 64-bit subfingerprints of one track (None if undecodable).
    Frame n's bits compare it with frame n−1, so a track with F spectral
    frames yields F−1 subfingerprints."""
    import numpy as np

    samples = _samples(content)
    if samples is None:
        return None
    e = _band_energies(samples)
    # bit(n, m) = ((E[n,m]-E[n,m+1]) - (E[n-1,m]-E[n-1,m+1])) > eps,
    # vectorized; eps = REL_EPS · total energy (see the constant's rationale)
    band_diff = e[:, :-1] - e[:, 1:]  # (n_frames, 64)
    d = band_diff[1:] - band_diff[:-1]  # (n_frames-1, 64)
    po2 = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    vals = (d > REL_EPS * float(e.sum())).astype(np.uint64) @ po2
    return [int(v) for v in vals.astype(np.int64)]  # signed-long wrap for Spark


def audio_fingerprints(
    files: DataFrame, content_col: str = "content"
) -> DataFrame:
    """(path, frame_index, afp, error): every track's per-frame 64-bit
    subfingerprints. Undecodable tracks yield ONE row with afp NULL and
    ``error`` set (they register but can never pair — the image-family
    convention). Map-only Arrow pass, no shuffle."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf[content_col]):
                fps = audio_fingerprint_bytes(bytes(content or b""))
                if fps is None:
                    rows.append((path, -1, None, "decode_error: no audio codec"))
                    continue
                for i, fp in enumerate(fps):
                    rows.append((path, i, fp, ""))
            out = pd.DataFrame(
                rows, columns=["path", "frame_index", "afp", "error"]
            )
            # afp MUST stay integer end-to-end: a None (error row) in the
            # same pdf flips the column to float64, silently rounding every
            # 64-bit hash in the Arrow batch to 53-bit precision — corrupted
            # hashes then miss real near-dup pairs, and WHICH batches were
            # corrupted depended on where the undecodable rows landed
            # (caught by the streaming≡batch parity test)
            out["afp"] = pd.array(
                [r[2] for r in rows], dtype="Int64"
            )
            yield out

    return files.select("path", content_col).mapInPandas(
        run, schema="path string, frame_index int, afp long, error string"
    )


def audio_near_dup(
    files: DataFrame,
    max_hamming: int = 6,
    min_shared_frames: int = 1,
) -> DataFrame:
    """Track-level near-duplicates: fingerprint every frame, band-join frame
    pairs (≤ ``max_hamming`` bits apart — pigeonhole-complete to distance 7
    at 8 bands), roll up to (track_a, track_b, n_shared_frames ≥
    ``min_shared_frames``). Same composition as ``video_near_dup``; the
    corpus-sized steps are the map-only fingerprint pass and one linear
    band shuffle."""
    from photo_vector_search_spark.operators.image_dedup import (
        hamming_pairs,
        rollup_frame_pairs,
    )

    fps = audio_fingerprints(files).filter(F.col("afp").isNotNull())
    fids = fps.select(
        F.concat_ws("#", F.col("path"), F.col("frame_index")).alias("fid"),
        F.col("afp"),
    )
    fpairs = hamming_pairs(
        fids, max_hamming=max_hamming, id_col="fid", hash_col="afp"
    )
    return rollup_frame_pairs(fpairs, min_shared_frames=min_shared_frames)
