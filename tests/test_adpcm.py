"""IMA ADPCM codec (`functions/adpcm.py`): roundtrip SNR bounds, RIFF
container shape, multimodal integration (compressed audio flows through
the same real-decode feature path as PCM), and loud rejection of
unsupported layouts."""

import numpy as np
import pytest

from kafka_connect_s3_ray.functions.adpcm import (
    BLOCK_ALIGN,
    SAMPLES_PER_BLOCK,
    STEP_TABLE,
    decode_adpcm_blocks,
    decode_wav_adpcm,
    encode_adpcm_blocks,
    encode_wav_adpcm,
)


def _sine(freq=440.0, amp=0.6, rate=8000, n=8000):
    t = np.arange(n)
    return (amp * 32767 * np.sin(2 * np.pi * freq * t / rate)).astype(np.int16)


def _snr(orig: np.ndarray, back: np.ndarray) -> float:
    err = back.astype(np.float64) - orig.astype(np.float64)
    return 10 * np.log10((orig.astype(np.float64) ** 2).mean()
                         / max((err ** 2).mean(), 1e-12))


def test_step_table_is_the_standard_89_entry_table():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767
    assert (np.diff(STEP_TABLE) > 0).all()
    # the table is ~exponential with ratio ~1.1 (the IMA spec's design)
    ratios = STEP_TABLE[1:].astype(float) / STEP_TABLE[:-1]
    assert 1.04 < np.median(ratios) < 1.13


def test_roundtrip_snr_and_compression():
    x = _sine()
    wav = encode_wav_adpcm(x, 8000)
    back, rate = decode_wav_adpcm(wav)
    assert rate == 8000 and len(back) == len(x)
    assert _snr(x, back) > 25.0          # real ADPCM quality, not noise
    assert len(wav) < 2 * len(x) / 3.5   # ~4:1 vs 16-bit PCM


@pytest.mark.parametrize("n", [0, 1, 3, SAMPLES_PER_BLOCK,
                               SAMPLES_PER_BLOCK + 1, 2 * SAMPLES_PER_BLOCK + 17])
def test_lengths_roundtrip_exactly(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal(n) * 3000).astype(np.int16)
    data, count = encode_adpcm_blocks(x)
    assert count == n
    back = decode_adpcm_blocks(data, n)
    assert len(back) == n
    if n:
        assert len(data) % BLOCK_ALIGN == 0
        # first sample of each block is stored verbatim
        assert back[0] == x[0]


def test_container_is_spec_shaped():
    wav = encode_wav_adpcm(_sine(n=2000), 16000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert b"fmt " in wav and b"fact" in wav and b"data" in wav
    fmt_at = wav.index(b"fmt ") + 8
    assert int.from_bytes(wav[fmt_at:fmt_at + 2], "little") == 0x0011
    # stdlib wave must REJECT it (that's why the numpy decoder exists)
    import io
    import wave as stdwave
    with pytest.raises(stdwave.Error):
        stdwave.open(io.BytesIO(wav), "rb")


def test_multimodal_decode_wav_falls_through_to_adpcm():
    from kafka_connect_s3_ray.functions.multimodal import decode_wav

    x = _sine(n=4000)
    back, rate = decode_wav(encode_wav_adpcm(x, 8000))
    assert rate == 8000 and len(back) == len(x)
    assert _snr(x, back) > 25.0


def test_features_from_adpcm_match_pcm_features_closely():
    """The same sine through PCM and ADPCM containers produces nearly the
    same REAL features (duration exact, RMS within ADPCM loss)."""
    from kafka_connect_s3_ray.functions.multimodal import (
        MediaFeatureExtractor, encode_wav)

    x = _sine(n=4000)
    ex = MediaFeatureExtractor()
    f_pcm = ex._features(encode_wav(x, 8000))
    f_adp = ex._features(encode_wav_adpcm(x, 8000))
    assert f_pcm[0] == f_adp[0]                      # duration_ms exact
    assert abs(f_pcm[1] - f_adp[1]) < 0.01           # RMS
    assert abs(f_pcm[3] - f_adp[3]) < 0.05           # peak


def test_unsupported_layouts_raise():
    wav = bytearray(encode_wav_adpcm(_sine(n=1000), 8000))
    with pytest.raises(ValueError):
        decode_wav_adpcm(b"RIFFxxxxNOPE")
    # stereo flag -> NotImplementedError naming the limitation
    fmt_at = wav.index(b"fmt ") + 8
    wav[fmt_at + 2] = 2
    with pytest.raises(NotImplementedError):
        decode_wav_adpcm(bytes(wav))
    with pytest.raises(ValueError):
        decode_adpcm_blocks(b"\x00" * (BLOCK_ALIGN + 1), 10)
