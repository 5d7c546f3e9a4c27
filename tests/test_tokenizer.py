import gzip
import json
import os

import numpy as np
import pytest

from xmask3d_tpu.data.tokenizer import (
    CLIPBPETokenizer,
    HashTokenizer,
    build_tokenizer,
    bytes_to_unicode,
)


def test_hash_tokenizer_contract():
    tok = HashTokenizer(vocab_size=512, context_length=16)
    out = tok(["hello world", ""])
    assert out.shape == (2, 16)
    assert out.dtype == np.int32
    assert out[0, 0] == 510  # sot
    assert (out >= 0).all() and (out < 512).all()
    # deterministic
    np.testing.assert_array_equal(out, tok(["hello world", ""]))
    # eot present after tokens
    assert 511 in out[0]


def test_build_tokenizer_fallback():
    tok = build_tokenizer("")
    assert isinstance(tok, HashTokenizer)
    assert tok(["a photo of a chair"]).shape == (1, 77)


_MINI_MERGES = [
    "c a", "ca t</w>", "p h", "h e", "he l", "hel l", "o f</w>", "a t</w>",
    "w o", "wo r", "l d</w>", "o t", "ph ot", "phot o</w>", "t h", "th e</w>",
    "i s</w>", "1 2", "e r", "er e</w>",
]


def _write_mini_vocab(tmp_path):
    """Materialize a miniature CLIP-style vocab: the open_clip construction
    (256 byte tokens + 256 </w> byte tokens + merges + sot/eot) as both the
    gzip merges file our tokenizer reads and the vocab.json+merges.txt pair
    transformers' CLIPTokenizer reads."""
    merges_gz = tmp_path / "bpe_mini.txt.gz"
    with gzip.open(merges_gz, "wt", encoding="utf-8") as f:
        f.write("#version: mini\n" + "\n".join(_MINI_MERGES) + "\n")

    vocab = list(bytes_to_unicode().values())
    vocab = vocab + [v + "</w>" for v in vocab]
    for m in _MINI_MERGES:
        vocab.append("".join(m.split()))
    vocab.extend(["<|startoftext|>", "<|endoftext|>"])
    vocab_json = tmp_path / "vocab.json"
    vocab_json.write_text(
        json.dumps(dict(zip(vocab, range(len(vocab))))), encoding="utf-8"
    )
    merges_txt = tmp_path / "merges.txt"
    merges_txt.write_text(
        "#version: mini\n" + "\n".join(_MINI_MERGES) + "\n", encoding="utf-8"
    )
    return merges_gz, vocab_json, merges_txt


def test_clip_bpe_vs_transformers_oracle(tmp_path):
    """Golden test of the BPE ALGORITHM: our CLIPBPETokenizer vs
    transformers' CLIPTokenizer (an independent implementation of OpenAI's
    CLIP byte-BPE) constructed from the SAME miniature merges list. Pins
    vocab construction, merge ranking, the regex split, and </w> handling.
    (ASCII inputs: transformers' no-ftfy BasicTokenizer path normalizes
    unicode slightly differently.)"""
    transformers = pytest.importorskip("transformers")

    merges_gz, vocab_json, merges_txt = _write_mini_vocab(tmp_path)
    ours = CLIPBPETokenizer(str(merges_gz))
    theirs = transformers.CLIPTokenizer(str(vocab_json), str(merges_txt))

    texts = [
        "a photo of a cat",
        "hello world!!",
        "The cat is here, obviously.",
        "it's 42 degrees",
        "photo-of-a-cat's cathedral",
    ]
    for text in texts:
        ref_ids = theirs.convert_tokens_to_ids(theirs._tokenize(text))
        assert ours.encode(text) == ref_ids, text
    # padded call contract: sot + ids + eot, zero-padded to 77
    out = ours("a photo of a cat")
    assert out.shape == (1, 77)
    assert out[0, 0] == ours.sot
    ref_ids = theirs.convert_tokens_to_ids(theirs._tokenize("a photo of a cat"))
    assert list(out[0, 1 : 1 + len(ref_ids)]) == ref_ids
    assert out[0, 1 + len(ref_ids)] == ours.eot
    assert (out[0, 2 + len(ref_ids) :] == 0).all()


_REAL_VOCAB = os.environ.get("XMASK3D_CLIP_VOCAB", "")


@pytest.mark.skipif(
    not (_REAL_VOCAB and os.path.exists(_REAL_VOCAB)),
    reason="real CLIP BPE vocab asset not staged (set XMASK3D_CLIP_VOCAB)",
)
def test_clip_bpe_known_openai_ids():
    """With the real bpe_simple_vocab_16e6.txt.gz staged, our tokenizer must
    reproduce OpenAI CLIP's published token ids exactly."""
    tok = CLIPBPETokenizer(_REAL_VOCAB)
    assert tok.sot == 49406 and tok.eot == 49407
    # openai/CLIP `tokenize("a photo of a cat")` reference ids
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    assert tok.encode("a diagram") == [320, 22697]
    out = tok("a photo of a cat")
    assert list(out[0, :7]) == [49406, 320, 1125, 539, 320, 2368, 49407]
