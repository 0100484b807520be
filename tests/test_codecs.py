"""Codec wire-format tests: base16384, lzma string codecs, spk_stat golden."""

import numpy as np
import pytest

from chattts_tpu import codecs
from chattts_tpu.config import load_spk_stat_string


@pytest.mark.parametrize("n", [0, 1, 2, 6, 7, 8, 13, 14, 100, 701, 3072])
def test_b14_round_trip(n):
    data = np.random.default_rng(n).integers(0, 256, n).astype(np.uint8).tobytes()
    enc = codecs.b14_encode(data)
    assert codecs.b14_decode(enc) == data
    # alphabet check: payload chars in CJK range, optional final pad marker
    body = enc[:-1] if (enc and 0x3D00 < ord(enc[-1]) <= 0x3D06) else enc
    assert all(0x4E00 <= ord(c) < 0x4E00 + 16384 for c in body)


def test_b14_padding_marker():
    # remainder r (payload % 7) is recorded as chr(0x3D00 + r)
    for n, expect_pad in [(7, False), (8, True), (13, True), (14, False)]:
        enc = codecs.b14_encode(b"\x01" * n)
        has_pad = 0x3D00 < ord(enc[-1]) <= 0x3D06
        assert has_pad == expect_pad
        if has_pad:
            assert ord(enc[-1]) - 0x3D00 == n % 7


def test_spk_stat_golden():
    """The embedded reference spk_stat string must decode to sane fp16 stats.

    This is real upstream data (ChatTTS/config/config.py:132-134), so it
    pins the b14 wire format bit-exactly.
    """
    std, mean = codecs.decode_spk_stat(load_spk_stat_string())
    assert std.shape == (768,) and mean.shape == (768,)
    assert std.dtype == np.float16
    s = std.astype(np.float32)
    m = mean.astype(np.float32)
    assert np.isfinite(s).all() and np.isfinite(m).all()
    assert (s > 0).all() and s.max() < 100
    assert abs(float(m.mean())) < 1.0


def test_b14_encode_golden_vs_upstream():
    """Encode-direction golden against real pybase16384 output.

    ``spk_stat.b14`` is vendored upstream data PRODUCED by the real
    pybase16384 encoder (ChatTTS/config/config.py:132-134).  base16384 is a
    canonical (deterministic, unambiguous) encoding, so re-encoding the
    decoded bytes must reproduce the exact upstream string - this pins
    b14_encode bit-for-bit, not just as the inverse of our own decoder.
    """
    s = load_spk_stat_string()
    data = codecs.b14_decode(s)
    assert len(data) == 768 * 2 * 2  # fp16 std+mean
    assert codecs.b14_encode(data) == s


def test_spk_emb_round_trip():
    emb = np.random.default_rng(1).standard_normal(768).astype(np.float16)
    s = codecs.encode_spk_emb(emb)
    assert isinstance(s, str)
    np.testing.assert_array_equal(codecs.decode_spk_emb(s), emb)


def test_code_prompt_round_trip():
    prompt = np.random.default_rng(2).integers(0, 625, (4, 77))
    s = codecs.encode_code_prompt(prompt)
    out = codecs.decode_code_prompt(s)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, prompt)


def test_coef_round_trip():
    coef = np.random.default_rng(3).random(100).astype(np.float32)
    np.testing.assert_array_equal(codecs.decode_coef(codecs.encode_coef(coef)), coef)
