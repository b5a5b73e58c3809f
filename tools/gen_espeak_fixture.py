"""Regenerate tests/fixtures/espeak_en_us_ipa.tsv from a REAL espeak.

Run on any machine with espeak-ng installed:

    python tools/gen_espeak_fixture.py [voice]

Reads the word list from the existing fixture, phonemizes every word
through the actual espeak front-end (binary or libespeak-ng), and
rewrites the fixture with exact outputs.  The in-repo
``models/phonemize._IPA_LEXICON`` should then be updated to match (the
gate in tests/test_phonemize_ipa.py flags every divergence).

This image ships no espeak (the reference's libs/libespeak-ng.dll is a
Windows PE without dictionary data), so the committed fixture records
espeak-ng en-us CONVENTIONS from documented examples; treat any entry a
real espeak disagrees with as a fixture bug and regenerate.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[0] / ".."))

from audiolab_tpu.models.phonemize import espeak_available, phonemize_espeak

FIXTURE = Path(__file__).resolve().parents[1] / "tests/fixtures/espeak_en_us_ipa.tsv"


def main() -> None:
    voice = sys.argv[1] if len(sys.argv) > 1 else "en-us"
    if not espeak_available():
        raise SystemExit("no espeak binary or libespeak-ng found on this "
                         "machine — install espeak-ng and re-run")
    words = [ln.split("\t")[0] for ln in FIXTURE.read_text().splitlines()
             if ln and not ln.startswith("#")]
    head = [ln for ln in FIXTURE.read_text().splitlines()
            if ln.startswith("#")]
    rows = []
    for w in words:
        ipa = phonemize_espeak(w, voice)
        if ipa is None:
            raise SystemExit(f"espeak failed on {w!r}")
        rows.append(f"{w}\t{ipa}")
        print(rows[-1])
    FIXTURE.write_text("\n".join(head + rows) + "\n")
    print(f"wrote {len(rows)} entries -> {FIXTURE}")


if __name__ == "__main__":
    main()
