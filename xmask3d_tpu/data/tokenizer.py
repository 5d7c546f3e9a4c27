"""CLIP text tokenizer (host-side).

Capability parity with open_clip.tokenize as used by the reference
(clip.py:54,149: 77-token padded CLIP BPE). Two modes:

* `CLIPBPETokenizer(vocab_path)`: the standard CLIP byte-level BPE, reading
  the gzip'd `bpe_simple_vocab_16e6.txt.gz` merges file (ship it alongside
  converted weights; it is not redistributed in this repo).
* `HashTokenizer`: a deterministic fallback used when no vocab file is
  available (CI / synthetic benchmarks). Same contract (sot/eot ids,
  fixed-length int32 output); NOT compatible with pretrained CLIP weights.
"""

from __future__ import annotations

import gzip
import hashlib
from functools import lru_cache
from typing import List, Sequence, Union

import numpy as np


@lru_cache()
def bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    return text.strip()


def whitespace_clean(text: str) -> str:
    return " ".join(text.split())


class CLIPBPETokenizer:
    """CLIP's byte-level BPE (vocab size 49408, context 77)."""

    def __init__(self, vocab_path: str, context_length: int = 77):
        import regex as re

        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            re.IGNORECASE,
        )
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def __call__(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, text in enumerate(texts):
            toks = [self.sot] + self.encode(text) + [self.eot]
            toks = toks[: self.context_length]
            if len(toks) == self.context_length:
                toks[-1] = self.eot
            out[i, : len(toks)] = toks
        return out


class HashTokenizer:
    """Deterministic stand-in tokenizer (no vocab assets required).

    Maps each whitespace word to a stable id in [3, vocab). Contract matches
    CLIPBPETokenizer (sot=vocab-2... kept at CLIP's ids by default).
    """

    def __init__(self, vocab_size: int = 49408, context_length: int = 77):
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.sot = vocab_size - 2
        self.eot = vocab_size - 1

    def encode(self, text: str) -> List[int]:
        words = whitespace_clean(basic_clean(text)).lower().split(" ")
        ids = []
        for w in words:
            if not w:
                continue
            h = int(hashlib.md5(w.encode()).hexdigest(), 16)
            ids.append(3 + h % (self.vocab_size - 5))
        return ids

    def __call__(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, text in enumerate(texts):
            toks = [self.sot] + self.encode(text) + [self.eot]
            toks = toks[: self.context_length]
            if len(toks) == self.context_length:
                toks[-1] = self.eot
            out[i, : len(toks)] = toks
        return out


def build_tokenizer(vocab_path: str = "", vocab_size: int = 49408, context_length: int = 77):
    if vocab_path:
        return CLIPBPETokenizer(vocab_path, context_length)
    return HashTokenizer(vocab_size, context_length)


def require_real_tokenizer(tokenizer, allow_hash: bool = False) -> None:
    """Refuse to run real-data pipelines on the HashTokenizer fallback.

    The HashTokenizer is only meaningful with randomly-initialized text
    towers (CI / synthetic benches); with pretrained CLIP weights it would
    silently produce garbage text banks. Real-data entry points call this
    right after build_tokenizer (reference always uses the real open_clip
    tokenizer, clip.py:54). Pass --allow_hash_tokenizer to override for
    from-scratch experiments.
    """
    if isinstance(tokenizer, HashTokenizer) and not allow_hash:
        raise RuntimeError(
            "refusing to run a real dataset with the HashTokenizer fallback: "
            "no CLIP BPE vocab configured (set `clip_bpe_vocab` to the "
            "bpe_simple_vocab_16e6.txt.gz path). Pretrained CLIP weights "
            "would silently receive garbage token ids. Pass "
            "--allow_hash_tokenizer to override (from-scratch runs only)."
        )
