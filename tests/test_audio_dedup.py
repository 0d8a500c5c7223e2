"""Audio fingerprint near-dup: bit parity vs an independently-written
Haitsma-Kalker reference, the perceptual properties (identical -> 0 bits,
small edit -> few bits on few frames, unrelated -> ~half bits), the track
rollup composition, and NULL/error contracts."""

from __future__ import annotations

import numpy as np

from photo_vector_search_spark.operators.audio_dedup import (
    HOP,
    MIN_NOTES,
    N_BANDS,
    SAMPLES_PER_BYTE,
    WINDOW,
    audio_fingerprint_bytes,
    audio_fingerprints,
    audio_near_dup,
)

U64 = (1 << 64) - 1


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & U64).count("1")


def _payload(seed: int, n: int = 256) -> bytes:
    return np.random.RandomState(seed).randint(0, 256, n, dtype=np.uint8).tobytes()


def _fake(payload: bytes) -> bytes:
    return b"FAKEAUDIO:" + payload


def _reference_fps(payload: bytes):
    """Independent reference: re-synthesize the note waveform and re-derive
    the Haitsma-Kalker bits with straight-line code (own framing loop, own
    log-band binning, matrix-DFT energies instead of rfft), applying the
    engine's sign-rule contract ``d > REL_EPS * total_energy``. Bits whose
    difference sits within 1e-3 (abs) of the epsilon threshold are
    DON'T-CARE (the engine and the reference may sum float energies in
    different orders, so threshold-straddling bits can legitimately
    disagree)."""
    if not payload:
        payload = b"\x00"
    n_notes = min(max(len(payload), MIN_NOTES), 512)
    wave = []
    for i in range(n_notes):
        b = payload[i % len(payload)]
        f = 2.0 + b / 10.0
        for s in range(SAMPLES_PER_BYTE):
            wave.append(np.sin(2.0 * np.pi * f * s / SAMPLES_PER_BYTE))
    wave = np.array(wave)
    # the band LAYOUT is a shared constant table (importing it keeps the
    # reference independent in the framing/energy/bit logic, which is what
    # can actually drift); its strict monotonicity is asserted here
    from photo_vector_search_spark.operators.audio_dedup import _band_edges

    edges = _band_edges()
    assert len(edges) == N_BANDS + 1
    assert all(int(edges[i]) < int(edges[i + 1]) for i in range(N_BANDS))
    assert edges[-1] <= WINDOW // 2
    win = np.hanning(WINDOW)
    n_frames = (len(wave) - WINDOW) // HOP + 1
    # DFT via explicit basis against the windowed frame
    k = np.arange(WINDOW // 2 + 1)
    basis = np.exp(-2j * np.pi * np.outer(k, np.arange(WINDOW)) / WINDOW)
    energies = []
    for n in range(n_frames):
        seg = wave[n * HOP : n * HOP + WINDOW] * win
        mag = np.abs(basis @ seg) ** 2
        energies.append([mag[edges[m] : edges[m + 1]].sum() for m in range(N_BANDS)])
    from photo_vector_search_spark.operators.audio_dedup import REL_EPS

    eps = REL_EPS * float(np.sum(energies))
    fps, cares = [], []
    for n in range(1, n_frames):
        bits, care = 0, 0
        for m in range(N_BANDS - 1):
            d = (energies[n][m] - energies[n][m + 1]) - (
                energies[n - 1][m] - energies[n - 1][m + 1]
            )
            if abs(d - eps) > 1e-3:
                care |= 1 << m
            if d > eps:
                bits |= 1 << m
        fps.append(bits)
        cares.append(care)
    return fps, cares


def test_fingerprint_matches_independent_reference():
    for seed in (1, 2, 3):
        payload = _payload(seed)
        got = audio_fingerprint_bytes(_fake(payload))
        want, cares = _reference_fps(payload)
        assert len(got) == len(want) and len(got) >= 5
        for g, w, c in zip(got, want, cares):
            assert (g & c & U64) == (w & c & U64), bin((g ^ w) & c & U64)


def test_perceptual_properties():
    pay = _payload(10)
    fa = audio_fingerprint_bytes(_fake(pay))
    # identical content -> identical fingerprints
    assert audio_fingerprint_bytes(_fake(pay)) == fa
    # one-byte edit -> most frames unchanged, touched frames only mildly
    pb = bytearray(pay)
    pb[100] = (pb[100] + 37) % 256
    fb = audio_fingerprint_bytes(_fake(bytes(pb)))
    dists = [_ham(x, y) for x, y in zip(fa, fb)]
    assert sum(1 for d in dists if d == 0) >= len(dists) - 4
    assert max(dists) <= 16
    # unrelated payload -> around half the bits differ on every frame
    fc = audio_fingerprint_bytes(_fake(_payload(11)))
    dists_u = [_ham(x, y) for x, y in zip(fa, fc)]
    assert min(dists_u) > 12 and 20 < float(np.mean(dists_u)) < 44
    # undecodable
    assert audio_fingerprint_bytes(b"mp3 soup") is None


def test_spark_fingerprints_and_error_rows(spark):
    pay = _payload(20)
    rows = spark.createDataFrame(
        [("t/a.wav", _fake(pay)), ("t/bad.wav", b"not audio"), ("t/n.wav", None)],
        "path string, content binary",
    )
    out = audio_fingerprints(rows).collect()
    by_path = {}
    for r in out:
        by_path.setdefault(r["path"], []).append(r)
    good = sorted(by_path["t/a.wav"], key=lambda r: r["frame_index"])
    assert [r["afp"] for r in good] == audio_fingerprint_bytes(_fake(pay))
    assert all(r["error"] == "" for r in good)
    for p in ("t/bad.wav", "t/n.wav"):
        (err,) = by_path[p]
        assert err["afp"] is None and err["frame_index"] == -1
        assert "decode_error" in err["error"]


def test_audio_near_dup_rollup(spark):
    pay = _payload(30)
    edited = bytearray(pay)
    edited[50] = (edited[50] + 90) % 256
    tracks = [
        ("a#1.wav", _fake(pay)),  # '#' in the path survives the rollup strip
        ("b.wav", _fake(bytes(edited))),  # near-dup of a
        ("c.wav", _fake(_payload(31))),  # unrelated
        ("bad.wav", b"static"),  # undecodable: registers, never pairs
    ]
    df = spark.createDataFrame(tracks, "path string, content binary")
    pairs = {
        (r["track_a"], r["track_b"]): r["n_shared_frames"]
        for r in audio_near_dup(df, max_hamming=6, min_shared_frames=3).collect()
    }
    assert ("a#1.wav", "b.wav") in pairs
    assert pairs[("a#1.wav", "b.wav")] >= 3
    for k in pairs:
        assert "c.wav" not in k and "bad.wav" not in k


def test_partitioning_invariance(spark):
    rows = [(f"t{i}.wav", _fake(_payload(100 + i))) for i in range(6)]
    df1 = spark.createDataFrame(rows, "path string, content binary")
    df2 = df1.repartition(5)
    a = sorted(
        (r["path"], r["frame_index"], r["afp"])
        for r in audio_fingerprints(df1).collect()
    )
    b = sorted(
        (r["path"], r["frame_index"], r["afp"])
        for r in audio_fingerprints(df2).collect()
    )
    assert a == b
