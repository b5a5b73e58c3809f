"""Rule-based English grapheme-to-phoneme front-end.

Stand-in for libespeak-ng (reference: modules/zonos/conditioning.py:180-207
phonemizes text before the Zonos conditioner; libs/libespeak-ng.dll).  A
compact letter-to-sound ruleset produces ARPAbet-like tokens — far closer
to espeak's output distribution than raw characters, and the conditioner
interface is unchanged (ids < 256).  Swap in espeak via ctypes when the
library is present.

Not a linguistics-grade G2P: rules cover the high-frequency digraphs,
magic-e, and common suffixes; unknown sequences fall back to letter sounds.
"""

from __future__ import annotations

import re

import numpy as np

# phoneme inventory (ARPAbet-ish), each mapped to a stable id
PHONEMES = [
    "sil", "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH",
    "ER", "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG",
    "OW", "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y",
    "Z", "ZH",
]
PHONE_ID = {p: i + 1 for i, p in enumerate(PHONEMES)}  # 0 = pad

# ordered digraph/trigraph rules (longest first)
_RULES = [
    ("tch", ["CH"]), ("igh", ["AY"]), ("eigh", ["EY"]), ("ough", ["AO"]),
    ("tion", ["SH", "AH", "N"]), ("sion", ["ZH", "AH", "N"]),
    ("ing", ["IH", "NG"]), ("qu", ["K", "W"]),
    ("ch", ["CH"]), ("sh", ["SH"]), ("th", ["TH"]), ("ph", ["F"]),
    ("wh", ["W"]), ("ck", ["K"]), ("ng", ["NG"]), ("kn", ["N"]),
    ("wr", ["R"]), ("oo", ["UW"]), ("ee", ["IY"]), ("ea", ["IY"]),
    ("ai", ["EY"]), ("ay", ["EY"]), ("oa", ["OW"]), ("ow", ["OW"]),
    ("ou", ["AW"]), ("oi", ["OY"]), ("oy", ["OY"]), ("au", ["AO"]),
    ("aw", ["AO"]), ("ar", ["AA", "R"]), ("er", ["ER"]), ("ir", ["ER"]),
    ("ur", ["ER"]), ("or", ["AO", "R"]),
]

_LETTER = {
    "a": ["AE"], "b": ["B"], "c": ["K"], "d": ["D"], "e": ["EH"],
    "f": ["F"], "g": ["G"], "h": ["HH"], "i": ["IH"], "j": ["JH"],
    "k": ["K"], "l": ["L"], "m": ["M"], "n": ["N"], "o": ["AA"],
    "p": ["P"], "q": ["K"], "r": ["R"], "s": ["S"], "t": ["T"],
    "u": ["AH"], "v": ["V"], "w": ["W"], "x": ["K", "S"], "y": ["Y"],
    "z": ["Z"],
}

_LONG_VOWEL = {"a": "EY", "e": "IY", "i": "AY", "o": "OW", "u": "UW"}

_NUM_WORDS = {
    "0": "zero", "1": "one", "2": "two", "3": "three", "4": "four",
    "5": "five", "6": "six", "7": "seven", "8": "eight", "9": "nine",
}


def normalize_text(text: str) -> str:
    """Lowercase, expand digits, strip to pronounceable chars."""
    text = text.lower()
    text = re.sub(r"\d", lambda m: " " + _NUM_WORDS[m.group()] + " ", text)
    text = re.sub(r"[^a-z\s'.,!?-]", " ", text)
    return " ".join(text.split())


def word_to_phonemes(word: str) -> list[str]:
    word = word.strip("'-")
    if not word:
        return []
    # magic-e: drop final silent e, lengthen the preceding vowel
    long_vowel_at = None
    if (len(word) >= 3 and word.endswith("e") and word[-2] not in "aeiou"
            and word[-3] in "aeiou"):
        long_vowel_at = len(word) - 3
        word = word[:-1]
    out: list[str] = []
    i = 0
    while i < len(word):
        if i == long_vowel_at and word[i] in _LONG_VOWEL:
            out.append(_LONG_VOWEL[word[i]])
            i += 1
            continue
        for pat, phs in _RULES:
            if word.startswith(pat, i):
                out.extend(phs)
                i += len(pat)
                break
        else:
            ch = word[i]
            if ch == "c" and i + 1 < len(word) and word[i + 1] in "eiy":
                out.append("S")          # soft c
            elif ch == "g" and i + 1 < len(word) and word[i + 1] in "eiy":
                out.append("JH")         # soft g
            else:
                out.extend(_LETTER.get(ch, []))
            i += 1
    return out


def phonemize(text: str) -> list[str]:
    """Text -> phoneme token list with 'sil' at punctuation boundaries."""
    out: list[str] = []
    for tok in normalize_text(text).split():
        bare = tok.strip(".,!?")
        out.extend(word_to_phonemes(bare))
        if tok[-1:] in ".,!?":
            out.append("sil")
    return out


def phonemize_ids(text: str, max_len: int = 256) -> np.ndarray:
    """Text -> int32 phoneme ids (0 = pad), drop-in for tokenize_text."""
    ids = [PHONE_ID[p] for p in phonemize(text)][:max_len]
    return np.asarray(ids, np.int32)
