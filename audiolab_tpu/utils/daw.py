"""DAW project export: Ableton Live .als and Reaper .rpp writers.

Reference behavior: handlers/ableton.py:17 (gzipped XML .als with one audio
track per stem), handlers/reaper.py:9 (reathon-built .rpp), wrappers/
export.py (BPM detect + zip).  Both formats are plain-text/XML; we emit them
directly with no template file or third-party lib.
"""

from __future__ import annotations

import gzip
import os
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np


def detect_bpm(audio: np.ndarray, sr: int) -> float:
    """Tempo via onset-strength autocorrelation (librosa.beat.tempo role,
    wrappers/export.py:18)."""
    x = np.asarray(audio, dtype=np.float32)
    if x.ndim == 2:
        x = x.mean(axis=0)
    hop = 512
    n = (len(x) // hop) * hop
    if n < hop * 8:
        return 120.0
    frames = x[:n].reshape(-1, hop)
    energy = (frames**2).sum(axis=1)
    onset = np.maximum(np.diff(energy), 0.0)
    if onset.std() < 1e-12:
        return 120.0
    onset = (onset - onset.mean()) / (onset.std() + 1e-9)
    ac = np.correlate(onset, onset, mode="full")[len(onset) - 1 :]
    fps = sr / hop
    lo, hi = int(fps * 60 / 200), int(fps * 60 / 60)  # 60-200 BPM lags
    if hi <= lo or hi >= len(ac):
        return 120.0
    lag = lo + int(np.argmax(ac[lo:hi]))
    return float(round(60.0 * fps / lag, 1))


def write_ableton_project(
    out_path: str,
    stems: list[str],
    bpm: float = 120.0,
    sample_rate: int = 44100,
) -> str:
    """Minimal valid Live 11 set: one audio track per stem, master tempo."""
    root = ET.Element(
        "Ableton",
        MajorVersion="5",
        MinorVersion="11.0_11202",
        Creator="audiolab_tpu",
        Revision="0",
    )
    live_set = ET.SubElement(root, "LiveSet")
    tracks = ET.SubElement(live_set, "Tracks")
    for i, stem in enumerate(stems):
        track = ET.SubElement(tracks, "AudioTrack", Id=str(10 + i))
        name = ET.SubElement(track, "Name")
        ET.SubElement(
            name, "EffectiveName", Value=os.path.splitext(os.path.basename(stem))[0]
        )
        dev = ET.SubElement(track, "DeviceChain")
        sample = ET.SubElement(dev, "SampleRef")
        fref = ET.SubElement(sample, "FileRef")
        ET.SubElement(fref, "Path", Value=os.path.abspath(stem))
    master = ET.SubElement(live_set, "MasterTrack")
    mixer = ET.SubElement(master, "DeviceChain")
    tempo = ET.SubElement(mixer, "Tempo")
    ET.SubElement(tempo, "Manual", Value=str(bpm))

    xml = ET.tostring(root, encoding="utf-8", xml_declaration=True)
    with gzip.open(out_path, "wb") as f:  # .als is gzipped XML
        f.write(xml)
    return out_path


def write_reaper_project(
    out_path: str,
    stems: list[str],
    bpm: float = 120.0,
    sample_rate: int = 44100,
) -> str:
    """Reaper .rpp: plain-text node tree, one track+item per stem."""
    lines = [
        "<REAPER_PROJECT 0.1 \"7.0\" 0",
        f"  TEMPO {bpm} 4 4",
        f"  SAMPLERATE {sample_rate} 0 0",
    ]
    for stem in stems:
        name = os.path.splitext(os.path.basename(stem))[0]
        lines += [
            "  <TRACK",
            f'    NAME "{name}"',
            "    <ITEM",
            "      POSITION 0",
            f'      NAME "{name}"',
            "      <SOURCE WAVE",
            f'        FILE "{os.path.abspath(stem)}"',
            "      >",
            "    >",
            "  >",
        ]
    lines.append(">")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_path


def zip_project(zip_path: str, files: list[str]) -> str:
    """Bundle project + stems (wrappers/export.py zips the project dir)."""
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files:
            z.write(f, arcname=os.path.basename(f))
    return zip_path
