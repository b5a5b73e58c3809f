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


def test_g2p_pronunciations():
    """Three-tier G2P gate (espeak stand-in quality): lexicon irregulars,
    voicing-aware inflections, and letter-to-sound syllable rules must
    produce CMUdict-class (stress-less ARPAbet) pronunciations."""
    from audiolab_tpu.models.phonemize import word_to_phonemes

    cases = {
        # tier 1: irregular lexicon (function words ~half of running text)
        "the": "DH AH", "one": "W AH N", "through": "TH R UW",
        "women": "W IH M AH N", "enough": "IH N AH F",
        # tier 2: voicing-aware -ed / -s / -es
        "loved": "L AH V D", "hoped": "HH OW P T",
        "wanted": "W AA N T IH D", "notes": "N OW T S",
        "dogs": "D AA G Z", "cats": "K AE T S",
        "boxes": "B AA K S IH Z", "churches": "CH ER CH IH Z",
        # tier 3: letter-to-sound (magic-e, -le open/closed, -ture,
        # soft c/g, intervocalic s, doubled consonants)
        "happy": "HH AE P IY", "little": "L IH T AH L",
        "table": "T EY B AH L", "title": "T AY T AH L",
        "music": "M Y UW Z IH K", "nature": "N EY CH ER",
        "measure": "M IY ZH ER", "city": "S IH T IY",
    }
    misses = {w: " ".join(word_to_phonemes(w))
              for w, want in cases.items()
              if " ".join(word_to_phonemes(w)) != want}
    assert not misses, misses
