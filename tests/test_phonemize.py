"""G2P front-end tests (espeak stand-in for the Zonos conditioner)."""

import numpy as np

from audiolab_tpu.models.phonemize import (
    PHONE_ID,
    normalize_text,
    phonemize,
    phonemize_ids,
    word_to_phonemes,
)


def test_normalize():
    assert normalize_text("Hello, World! 42") == "hello, world! four two"


def test_digraphs_and_magic_e():
    assert word_to_phonemes("ship") == ["SH", "IH", "P"]
    assert word_to_phonemes("chat") == ["CH", "AE", "T"]
    assert word_to_phonemes("make") == ["M", "EY", "K"]   # magic-e
    assert word_to_phonemes("night") == ["N", "AY", "T"]  # igh
    assert word_to_phonemes("sing")[-1] == "NG"
    assert word_to_phonemes("city")[0] == "S"             # soft c


def test_phonemize_sentence():
    phs = phonemize("The ship sails. Tonight!")
    assert "sil" in phs
    assert all(p in PHONE_ID or p == "sil" for p in phs)


def test_phonemize_ids_bounds():
    ids = phonemize_ids("a quick brown fox jumps over the lazy dog")
    assert ids.dtype == np.int32
    assert ids.min() >= 1 and ids.max() <= len(PHONE_ID)
    assert len(ids) > 10
