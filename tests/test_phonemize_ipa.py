"""espeak-IPA front-end gates (reference:
modules/zonos/conditioning.py:180-207 phonemizes through EspeakBackend
with_stress=True and tokenizes chars against the VITS symbol table).

The image ships no espeak, so the oracle is layered:
  - when a real espeak binary/library IS present, every fixture word is
    checked against its exact output (tier-1 parity, the reference's path);
  - always: the lexicon tier must reproduce the committed fixture
    word-by-word, and every produced IPA char must tokenize into the
    published Zonos phoneme vocabulary without UNK (a convention drift —
    wrong glyph choice — would surface as UNK ids or fixture mismatch).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from audiolab_tpu.models.phonemize import (
    _IPA_LEXICON,
    espeak_available,
    phonemize_espeak,
    phonemize_ipa,
)
from audiolab_tpu.models.zonos import (
    ZONOS_UNK_ID,
    tokenize_phonemes_np,
)

FIXTURE = Path(__file__).parent / "fixtures/espeak_en_us_ipa.tsv"


def _fixture() -> dict[str, str]:
    out = {}
    for ln in FIXTURE.read_text().splitlines():
        if ln and not ln.startswith("#"):
            w, ipa = ln.split("\t")
            out[w] = ipa
    return out


def test_lexicon_matches_fixture_word_by_word():
    fx = _fixture()
    assert len(fx) >= 100
    diffs = {w: (ipa, _IPA_LEXICON.get(w))
             for w, ipa in fx.items() if _IPA_LEXICON.get(w) != ipa}
    assert not diffs, f"lexicon/fixture divergence: {diffs}"


def test_ipa_tokenizes_into_zonos_vocab_without_unk():
    """Every glyph the front-end can emit must hit a real
    phoneme_embedder row (conditioning.py:148-158 maps unknown chars to
    UNK — a convention drift would silently degrade synthesis)."""
    fx = _fixture()
    text = " ".join(fx.values())
    ids = tokenize_phonemes_np([text])[0]
    assert ZONOS_UNK_ID not in ids.tolist()
    # sentence path too (includes fallback-rule words + punctuation)
    s = phonemize_ipa("Strange xylophones vibrate, quietly echoing!")
    ids = tokenize_phonemes_np([s])[0]
    assert ZONOS_UNK_ID not in ids.tolist()


def test_sentence_phonemization_stress_and_punctuation():
    s = phonemize_ipa("Hello world, this is a test.")
    # documented espeak example: "həlˈoʊ wˈɜːld" / "ðɪs ɪz ɐ tˈɛst"
    assert s == "həlˈoʊ wˈɜːld, ðɪs ɪz ɐ tˈɛst."


def test_fallback_words_get_primary_stress():
    s = phonemize_ipa("zebra")  # not in the lexicon -> rule tier
    assert "ˈ" in s


@pytest.mark.skipif(not espeak_available(), reason="no espeak on this host")
def test_real_espeak_parity_when_present():
    """Tier-1 gate: with a real espeak installed, the fixture must match
    its exact output (run tools/gen_espeak_fixture.py on divergence)."""
    fx = _fixture()
    bad = {}
    for w, ipa in fx.items():
        real = phonemize_espeak(w)
        if real != ipa:
            bad[w] = (ipa, real)
    assert not bad, f"fixture out of date vs real espeak: {bad}"


def test_ipa_feeds_zonos_prefix_shapes():
    ids = tokenize_phonemes_np([phonemize_ipa("good morning"),
                                phonemize_ipa("thank you")])
    assert ids.ndim == 2 and ids.shape[0] == 2
    assert (ids >= 0).all()
    assert int((ids == ZONOS_UNK_ID).sum()) == 0
