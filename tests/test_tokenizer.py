"""Tokenizer: left-padding, vq expansion, code-prompt splicing, round trip."""

import numpy as np

from chattts_tpu.models.tokenizer import Tokenizer


def test_fallback_round_trip():
    tok = Tokenizer(None, vocab_size=21178)
    text = "[Stts][spk_emb][speed_5]hello world[uv_break]ok[laugh][Ptts]"
    ids = tok._backend.encode(text)
    assert tok._backend.decode(ids) == text


def test_control_token_ordering():
    """Everything >= [break_0] must be control (core.py:426-427 filter)."""
    tok = Tokenizer(None)
    assert tok.break_0_ids <= tok.spk_emb_ids
    assert tok.break_0_ids <= tok.eos_token
    text_ids = tok._backend.encode("plain text")
    assert all(i < tok.break_0_ids for i in text_ids)


def test_encode_left_padding():
    tok = Tokenizer(None)
    ids, attn, tmask = tok.encode(["short", "a much longer sentence"], num_vq=4)
    B, T, V = ids.shape
    assert V == 4
    # row 0 is left-padded: padding prefix has mask False and ids 0
    pad = T - len(tok._backend.encode("short"))
    assert not attn[0, :pad].any() and attn[0, pad:].all()
    assert (ids[0, :pad] == 0).all()
    assert attn[1].all()
    # all 4 vq dims carry the same text ids
    assert (ids[:, :, 0:1] == ids).all()
    np.testing.assert_array_equal(tmask, attn)


def test_encode_with_code_prompt():
    tok = Tokenizer(None)
    prompt = np.arange(8).reshape(4, 2)  # (num_vq, 2)
    ids, attn, tmask = tok.encode(["hey"], num_vq=4, prompt=prompt)
    T = ids.shape[1]
    # tail positions hold the code prompt, attended but not text
    np.testing.assert_array_equal(ids[0, T - 2 :], prompt.T)
    assert attn[0, T - 2 :].all()
    assert not tmask[0, T - 2 :].any()
    assert tmask[0, : T - 2].all()
