"""YuE mm-tokenizer + codec-id layout parity vs the reference code.

Oracles:
  * modules/yue/inference/mmtokenizer.py `_MMSentencePieceTokenizer` is
    IMPORTED AND RUN (its sentencepiece dependency satisfied by the
    pure-Python utils/spm processor injected as a stand-in module), so the
    special-token id layout, special-aware tokenize() and detokenize()
    are checked against the actual upstream logic.
  * modules/yue/inference/codecmanipulator.py `CodecManipulator` is pure
    numpy/einops and runs directly as the oracle for MMCodecTool.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

from audiolab_tpu.models.mm_vocab import (
    MM_CODEC_CFG,
    MM_SPECIAL_TOKENS,
    MM_VOCAB_LEN,
    MMCodecTool,
    MMTokenizer,
)
from audiolab_tpu.utils.spm import (
    BPE,
    BYTE,
    CONTROL,
    NORMAL,
    UNIGRAM,
    UNKNOWN,
    SentencePieceProcessor,
    build_model_proto,
)

REF_DIR = "/root/reference/modules/yue/inference"


def _tiny_unigram_proto(with_mm_specials: bool = False) -> bytes:
    pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
        ("▁", -2.0, NORMAL),
        ("▁the", -3.0, NORMAL),
        ("▁fire", -4.0, NORMAL),
        ("▁in", -3.2, NORMAL),
        ("▁verse", -4.2, NORMAL),
        ("▁of", -3.1, NORMAL),
        ("[", -7.0, NORMAL),
        ("]", -7.0, NORMAL),
    ]
    for ch in "abcdefghijklmnopqrstuvwxyz".upper():
        pieces.append((ch, -8.5, NORMAL))
    for ch in "abcdefghijklmnopqrstuvwxyz0123456789.,!?'\n":
        pieces.append((ch, -8.0, NORMAL))
    if with_mm_specials:
        # the published tokenizer.model carries the control pieces itself
        for tok in MM_SPECIAL_TOKENS:
            pieces.append((tok, 0.0, CONTROL))
    return build_model_proto(pieces, model_type=UNIGRAM)


def _load_reference_mmtokenizer(model_file: str):
    """Import the reference class with sentencepiece satisfied by the
    pure-python processor (behavior under test = the WRAPPER layout)."""
    fake = types.ModuleType("sentencepiece")

    class _SP(SentencePieceProcessor):
        def __init__(self, model_file=None):
            super().__init__(model_file=model_file)

        def __len__(self):
            return super().__len__()

    fake.SentencePieceProcessor = _SP
    saved = sys.modules.get("sentencepiece")
    sys.modules["sentencepiece"] = fake
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_mmtokenizer", f"{REF_DIR}/mmtokenizer.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod._MMSentencePieceTokenizer(model_file)
    finally:
        if saved is not None:
            sys.modules["sentencepiece"] = saved
        else:
            sys.modules.pop("sentencepiece", None)


LYRIC_CORPUS = [
    "the fire in the verse",
    "[verse]\nthe fire of the fire\n[chorus]\nin in in",
    "Generate music from the given lyrics segment by segment.\n"
    "[Genre] pop rock\nthe fire",
    "a <SOA> b <EOA> c <stage_1> d <stage_2> e",
    "<SOA><EOA>",
    "",
    "plain text, no specials!",
]


@pytest.mark.parametrize("with_specials", [False, True])
def test_mmtokenizer_layout_parity(tmp_path, with_specials):
    """Special-token ids, tokenize() and detokenize() match the upstream
    _MMSentencePieceTokenizer byte-for-byte on a lyric corpus."""
    mf = tmp_path / "tok.model"
    mf.write_bytes(_tiny_unigram_proto(with_mm_specials=with_specials))
    ref = _load_reference_mmtokenizer(str(mf))
    ours = MMTokenizer(model_file=str(mf))

    assert ours.vocab_size == ref.vocab_size
    for name in ("soa", "eoa", "sov", "eov", "soi", "eoi", "s_local",
                 "e_local", "s_global", "e_global", "stage_1", "stage_2",
                 "cls", "sep", "eod", "mask", "pad", "bos", "eos"):
        assert getattr(ours, name) == getattr(ref, name), name
    assert ours.vocab == ref.vocab

    for text in LYRIC_CORPUS:
        ids_ref = ref.tokenize(text)
        ids_ours = ours.tokenize(text)
        assert ids_ours == ids_ref, text
        assert ours.detokenize(ids_ours) == ref.detokenize(ids_ref)


def test_mmtokenizer_specials_in_model_get_model_ids(tmp_path):
    """When the .model already contains <SOA> etc. (the published file
    does), the wrapper must reuse those ids instead of appending."""
    mf = tmp_path / "tok.model"
    mf.write_bytes(_tiny_unigram_proto(with_mm_specials=True))
    ours = MMTokenizer(model_file=str(mf))
    sp = SentencePieceProcessor(model_file=str(mf))
    assert ours.soa == sp.piece_to_id("<SOA>")
    # exactly the tokens NOT in the model get appended: CLS, SEP, MASK
    # (EOD..stage_2 are model pieces and reused) plus <PAD> (pad_id=-1);
    # BOS/EOS resolve to the <s>/</s> control pieces already present
    assert ours.vocab_size == len(sp) + 4
    assert ours.cls == len(sp)


def _load_reference_codectool():
    spec = importlib.util.spec_from_file_location(
        "ref_codecmanip", f"{REF_DIR}/codecmanipulator.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.CodecManipulator


@pytest.mark.parametrize("codec_type,nq", [("xcodec", 1), ("xcodec", 8),
                                           ("xcodec", 12), ("dac16k", 4)])
def test_codec_tool_parity(codec_type, nq):
    """offset/unoffset/flatten/unflatten/npy2ids/ids2npy match the
    reference CodecManipulator on random frames."""
    RefCM = _load_reference_codectool()
    ref = RefCM(codec_type, 0, nq)
    ours = MMCodecTool(codec_type, 0, nq)
    rng = np.random.default_rng(0)
    k = MM_CODEC_CFG[codec_type]["num_codebooks"]
    codes = rng.integers(0, MM_CODEC_CFG[codec_type]["codebook_size"],
                         (k, 37)).astype(np.int64)

    off_ref = ref.offset_tok_ids(
        codes, global_offset=ref.global_offset,
        codebook_size=ref.codebook_size, num_codebooks=ref.num_codebooks)
    off_ours = ours.offset_tok_ids(codes)
    np.testing.assert_array_equal(off_ours, off_ref)

    flat_ref = ref.flatten(off_ref)
    flat_ours = ours.flatten(off_ours)
    np.testing.assert_array_equal(flat_ours, flat_ref)

    unflat = ours.unflatten(flat_ours, nq)
    np.testing.assert_array_equal(unflat, ref.unflatten(flat_ref, nq))

    back_ref = ref.unoffset_tok_ids(
        unflat, global_offset=ref.global_offset,
        codebook_size=ref.codebook_size, num_codebooks=ref.num_codebooks)
    np.testing.assert_array_equal(ours.unoffset_tok_ids(unflat), back_ref)
    np.testing.assert_array_equal(ours.ids2npy(flat_ours),
                                  codes[:nq])

    np.testing.assert_array_equal(np.asarray(ours.npy2ids(codes)),
                                  np.asarray(ref.npy2ids(codes)))


def test_mm_constants_against_reference_table():
    """The module constants equal the reference's mm_v0_2 config dict."""
    RefCM = _load_reference_codectool()
    ref = RefCM("xcodec", 0, 1)
    cfg = ref.mm_v0_2_cfg
    assert MM_SPECIAL_TOKENS == cfg["special_tokens"]
    assert MM_VOCAB_LEN == cfg["metadata"]["len"]
    for name, ours in MM_CODEC_CFG.items():
        theirs = cfg[name]
        assert ours["global_offset"] == theirs["global_offset"], name
        assert ours["sep"] == theirs["sep"], name


def test_spm_unigram_encode_decode():
    """Pure-python unigram Viterbi: known-best segmentations + decode."""
    proto = _tiny_unigram_proto()
    sp = SentencePieceProcessor(model_proto=proto)
    # "the fire" -> ▁the + ▁fire beats char paths by score
    ids = sp.encode_as_ids("the fire")
    assert [sp.id_to_piece(i) for i in ids] == ["▁the", "▁fire"]
    assert sp.decode_ids(ids) == "the fire"
    # whitespace collapse + dummy prefix
    assert sp.encode_as_ids("  the   fire ") == ids
    # unknown char -> unk id
    ids2 = sp.encode_as_ids("the £")
    assert sp.m.unk_id in ids2
    assert sp.decode_ids([sp.m.unk_id]) == sp.m.unk_surface.lstrip()


def test_spm_bpe_encode():
    """BPE merge order follows scores (higher merges first)."""
    pieces = [
        ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
        ("a", -10.0, NORMAL), ("b", -10.0, NORMAL), ("ab", -1.0, NORMAL),
        ("▁", -10.0, NORMAL), ("▁ab", -2.0, NORMAL), ("abb", -3.0, NORMAL),
    ]
    sp = SentencePieceProcessor(
        model_proto=build_model_proto(pieces, model_type=BPE))
    ids = sp.encode_as_ids("abb")
    # ▁ + a -> no; a+b (score -1) merges first -> ab, then ▁+ab -> ▁ab
    assert [sp.id_to_piece(i) for i in ids] == ["▁ab", "b"]


def test_spm_byte_fallback():
    pieces = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
              ("</s>", 0.0, CONTROL), ("▁", -2.0, NORMAL),
              ("x", -5.0, NORMAL)]
    pieces += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    sp = SentencePieceProcessor(model_proto=build_model_proto(
        pieces, model_type=UNIGRAM, byte_fallback=True))
    ids = sp.encode_as_ids("xé")
    assert sp.m.unk_id not in ids
    assert sp.decode_ids(ids) == "xé"


def test_charsmap_trie_longest_match():
    """darts-clone traversal: longest rule wins, fillers never match."""
    from audiolab_tpu.utils.spm import PrecompiledCharsMap, build_charsmap

    cmap = PrecompiledCharsMap(build_charsmap({
        "a": "x", "ab": "y", "ﬁ": "fi", "Ｆ": "F", "　": " ",
        "\t": " ", "\x01": "",
    }))
    data = "ab".encode("utf-8")
    val, ln = cmap.longest_match(data, 0)
    assert ln == 2 and cmap.replacement(val) == b"y"   # longest, not first
    val, ln = cmap.longest_match("aq".encode(), 0)
    assert ln == 1 and cmap.replacement(val) == b"x"
    val, ln = cmap.longest_match("ﬁre".encode(), 0)
    assert ln == len("ﬁ".encode()) and cmap.replacement(val) == b"fi"
    _, ln = cmap.longest_match(b"qqq", 0)
    assert ln == 0                                     # no rule
    val, ln = cmap.longest_match(b"z\x01z", 1)
    assert ln == 1 and cmap.replacement(val) == b""    # deletion rule


def test_charsmap_normalization_end_to_end():
    """nmt_nfkc-style rules change SEGMENTATION, not just surface text:
    fullwidth/ligature/space rules embedded in the .model flow through
    encode_as_ids exactly like the C++ normalizer (mmtokenizer.py:63-71
    gets this via the sentencepiece wheel)."""
    from audiolab_tpu.utils.spm import build_charsmap

    cmap = build_charsmap({
        "ﬁ": "fi", "　": " ", "\t": " ", "Ｔ": "T", "\x00": "",
    })
    plain = SentencePieceProcessor(model_proto=_tiny_unigram_proto())
    with_map = SentencePieceProcessor(model_proto=build_model_proto(
        # same pieces, plus the charsmap in NormalizerSpec
        [(plain.id_to_piece(i), plain.m.pieces[i][1], plain.m.pieces[i][2])
         for i in range(len(plain))],
        precompiled_charsmap=cmap))
    want = plain.encode_as_ids("the fire")
    # ideographic space + fi-ligature normalize into the same ids
    assert with_map.encode_as_ids("the　ﬁre") == want
    # tab rule + extra-whitespace collapse interleave like normalizer.cc
    assert with_map.encode_as_ids(" \t the \t\t ﬁre\t") == want
    # without the charsmap the ligature cannot match ▁fire
    assert plain.encode_as_ids("the ﬁre") != want
    # deletion rule drops the byte entirely
    assert with_map.encode_as_ids("the \x00ﬁre") == want


def test_charsmap_replacement_spaces_collapse():
    """A replacement ENDING in a space must arm the collapse for the next
    chunk (normalizer.cc tracks is_prev_space across chunks)."""
    from audiolab_tpu.utils.spm import build_charsmap

    sp = SentencePieceProcessor(model_proto=build_model_proto(
        [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
         ("</s>", 0.0, CONTROL), ("▁a", -1.0, NORMAL),
         ("▁b", -1.0, NORMAL), ("a", -5.0, NORMAL), ("b", -5.0, NORMAL),
         ("▁", -5.0, NORMAL)],
        precompiled_charsmap=build_charsmap({"X": "a "})))
    # "X b" -> "a  b" -> collapse -> ▁a ▁b
    assert ([sp.id_to_piece(i) for i in sp.encode_as_ids("X b")]
            == ["▁a", "▁b"])
