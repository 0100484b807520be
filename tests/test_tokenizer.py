"""Tokenizer: left-padding, vq expansion, code-prompt splicing, round trip.

Covers BOTH backends: the asset-free fallback and the HF
``BertTokenizerFast`` path that every real-asset user hits
(reference ``ChatTTS/model/tokenizer.py:16-33``) - the HF tests build a
synthetic Bert vocab with the ChatTTS control tokens appended, mirroring
the real asset's layout (control tokens at high ids)."""

import logging

import numpy as np
import pytest

from chattts_tpu.models.tokenizer import CONTROL_TOKENS, Tokenizer


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


# ---------------------------------------------------------------------------
# HF (BertTokenizerFast) backend
# ---------------------------------------------------------------------------

_BASE_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
               "hello", "world", "a", "much", "longer", "sentence",
               "short", "hey", "ok", "what", "is", "your", "favorite",
               "english", "food", "?"]


def _hf_dir(tmp_path, control_tokens=CONTROL_TOKENS):
    """Synthetic BertTokenizerFast asset dir: base vocab + control tokens
    appended (the real asset keeps every control token at high ids)."""
    from transformers import BertTokenizerFast

    (tmp_path / "vocab.txt").write_text("\n".join(_BASE_VOCAB))
    tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"),
                            do_lower_case=False)
    tok.add_tokens(list(control_tokens))
    out = tmp_path / "tokenizer"
    tok.save_pretrained(str(out))
    return str(out)


def test_hf_backend_specials_and_ordering(tmp_path, caplog):
    with caplog.at_level(logging.WARNING, "chattts_tpu.models.tokenizer"):
        tok = Tokenizer(_hf_dir(tmp_path))
    assert "control tokens below" not in caplog.text
    base = len(_BASE_VOCAB)
    assert tok.break_0_ids == base  # [break_0] is the first control token
    assert tok.spk_emb_ids >= tok.break_0_ids
    assert tok.eos_token >= tok.break_0_ids
    assert tok.len == base + len(CONTROL_TOKENS)
    # plain text stays strictly below the control region
    assert all(i < tok.break_0_ids for i in tok._backend.encode("hello world"))


def test_hf_backend_ordering_guard_fires(tmp_path, caplog):
    """A vocab that places a control token below [break_0] breaks the
    refine filter's assumption - the load-time guard must warn."""
    reordered = ["[uv_break]", "[laugh]"] + [
        t for t in CONTROL_TOKENS if t not in ("[uv_break]", "[laugh]")]
    path = _hf_dir(tmp_path, control_tokens=reordered)
    with caplog.at_level(logging.WARNING, "chattts_tpu.models.tokenizer"):
        Tokenizer(path)
    assert "control tokens below" in caplog.text
    assert "[uv_break]" in caplog.text and "[laugh]" in caplog.text


def test_hf_backend_encode_left_pad_and_splice(tmp_path):
    """The encode chain (left-pad, x num_vq expansion, code-prompt splice)
    through the REAL HF backend (reference tokenizer.py:73-124)."""
    tok = Tokenizer(_hf_dir(tmp_path))
    prompt = np.arange(12).reshape(4, 3)  # (num_vq, 3) clone codes
    ids, attn, tmask = tok.encode(
        ["hello world", "a much longer sentence hey"], num_vq=4,
        prompt=prompt)
    B, T, V = ids.shape
    assert (B, V) == (2, 4)
    n0 = len(tok._backend.encode("hello world"))
    pad = T - 3 - n0
    assert pad > 0
    assert not attn[0, :pad].any() and attn[0, pad:].all()
    assert (ids[0, :pad] == 0).all()
    # text region: same ids across all 4 vq dims; splice region: codes
    assert (ids[:, : T - 3, 0:1] == ids[:, : T - 3]).all()
    np.testing.assert_array_equal(ids[0, T - 3 :], prompt.T)
    np.testing.assert_array_equal(ids[1, T - 3 :], prompt.T)
    assert attn[:, T - 3 :].all() and not tmask[:, T - 3 :].any()
    assert tmask[0, pad : T - 3].all()


def test_hf_backend_decorated_prompt_round_trip(tmp_path):
    """#655-style round trip: a decorated code prompt encodes to single ids
    per control token and decodes back to the same token sequence."""
    from chattts_tpu.models.speaker import Speaker

    tok = Tokenizer(_hf_dir(tmp_path))
    (text,) = Speaker.decorate_code_prompts(
        ["what is [uv_break] your favorite english food ? [laugh]"],
        prompt="[speed_5]", txt_smp=None, spk_emb="x")
    ids = tok._backend.encode(text)
    # every control token present as ONE id in the control region
    for t in ("[Stts]", "[spk_emb]", "[speed_5]", "[uv_break]", "[laugh]",
              "[Ptts]"):
        assert tok._backend.token_id(t) in ids
    # id-level round trip: decode inserts token-joining whitespace, but
    # re-encoding the decoded string must reproduce the exact ids
    decoded = tok.decode([np.asarray(ids)])[0]
    assert tok._backend.encode(decoded) == ids


def test_hf_backend_refine_filter_strips_controls(tmp_path):
    """`ids < break_0_ids` must strip exactly the control tokens from a
    refined sequence (core.py refine filter; reference core.py:426-427)."""
    tok = Tokenizer(_hf_dir(tmp_path))
    ids = np.asarray(tok._backend.encode(
        "hello [uv_break] world [lbreak]"), np.int32)
    kept = ids[ids < tok.break_0_ids]
    decoded = tok.decode([kept])[0]
    assert "[uv_break]" not in decoded and "[lbreak]" not in decoded
    assert "hello" in decoded and "world" in decoded
