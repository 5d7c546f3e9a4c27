import numpy as np

from xmask3d_tpu.data.tokenizer import HashTokenizer, build_tokenizer


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
