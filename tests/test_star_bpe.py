"""Golden equivalence of our pinned Roberta BPE vs the reference's vendored
transformers-2.8 STAR tokenizer (``SimANS/Doc_training/star_tokenizer.py``),
imported directly from the reference checkout and run on a shared synthetic
vocab — token-for-token, id-for-id."""

import json
import sys
import types

import pytest

from simxns_tpu.data.star_bpe import StarRobertaTokenizer, _byte_to_unicode

REF_DIR = "/root/reference/SimANS/Doc_training"

MERGES = [
    ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("Ġ", "a"), ("i", "n"), ("o", "u"), ("r", "e"),
    ("Ġa", "nd"), ("e", "s"), ("o", "n"), ("Ġ", "s"), ("in", "g"),
    ("'", "s"), ("1", "2"), ("12", "3"), (".", "."), ("!", "!"),
]

TEXTS = [
    "the cat sat on the mat",
    "Hello, World!  Multiple   spaces\tand\ttabs\nnewlines",
    "it's the user's cat'll don't",
    "numbers 123 456789 3.14 and 12,000",
    "punctuation!!! ... ??? ---",
    "unicode café naïve 北京 åæø é",
    "emoji 🙂 and symbols © ® ±",
    " leading space",
    "trailing space ",
    "MixedCASE Words And CAPS",
    "a",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
]


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("starvocab")
    tokens = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    tokens += list(_byte_to_unicode().values())
    tokens += [a + b for a, b in MERGES]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    vp, mp = str(d / "vocab.json"), str(d / "merges.txt")
    with open(vp, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(mp, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in MERGES:
            f.write(f"{a} {b}\n")
    return vp, mp


@pytest.fixture(scope="module")
def ref_tokenizer(vocab_files):
    # the vendored module imports boto3/botocore for its (unused here)
    # download path; stub them so the import succeeds offline
    for name in ("boto3", "botocore", "botocore.config",
                 "botocore.exceptions"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "botocore.config":
                mod.Config = object
            if name == "botocore.exceptions":
                mod.ClientError = Exception
            sys.modules[name] = mod
    sys.path.insert(0, REF_DIR)
    try:
        import star_tokenizer
    finally:
        sys.path.remove(REF_DIR)
    vp, mp = vocab_files
    return star_tokenizer.RobertaTokenizer(vp, mp, do_lower_case=True)


@pytest.fixture(scope="module")
def our_tokenizer(vocab_files):
    vp, mp = vocab_files
    return StarRobertaTokenizer(vp, mp, do_lower_case=True)


@pytest.mark.parametrize("text", TEXTS)
def test_encode_matches_reference(text, ref_tokenizer, our_tokenizer):
    ref = ref_tokenizer.encode(text, add_special_tokens=True)
    ours = our_tokenizer.encode(text)
    assert ours == ref, f"mismatch on {text!r}"


@pytest.mark.parametrize("text", TEXTS)
def test_tokenize_matches_reference(text, ref_tokenizer, our_tokenizer):
    assert (our_tokenizer.tokenize(text)
            == ref_tokenizer.tokenize(text, add_prefix_space=False))


def test_truncation_matches_reference(ref_tokenizer, our_tokenizer):
    text = "the cat sat on the mat and the dog ran in the sun " * 4
    for max_len in (8, 16, 31):
        ref = ref_tokenizer.encode(text, add_special_tokens=True,
                                   max_length=max_len)
        assert our_tokenizer.encode(text, max_length=max_len) == ref
        assert len(ref) == max_len


def test_pair_encoding_matches_reference(ref_tokenizer, our_tokenizer):
    a, b = "the cat and dog", "running in 123 spaces"
    ref = ref_tokenizer.encode(a, b, add_special_tokens=True)
    assert our_tokenizer.encode(a, text_pair=b) == ref
    # <s> A </s></s> B </s> layout
    sep, cls = our_tokenizer.sep_token_id, our_tokenizer.cls_token_id
    assert ref[0] == cls and ref[-1] == sep and ref.count(sep) == 3
    # pair truncation (longest_first, pair on ties)
    for max_len in (9, 14):
        ref_t = ref_tokenizer.encode(a, b, add_special_tokens=True,
                                     max_length=max_len)
        assert our_tokenizer.encode(a, text_pair=b, max_length=max_len) == ref_t


def test_do_lower_case_is_ignored(our_tokenizer):
    """The 2.8 quirk every Doc_training entry relies on: do_lower_case=True
    is swallowed — capitalization changes the tokenization."""
    assert (our_tokenizer.encode("Hello") != our_tokenizer.encode("hello"))


def test_decode_roundtrip(our_tokenizer):
    for text in TEXTS:
        ids = our_tokenizer.encode(text)
        # encode() adds one prefix space when the text starts non-space
        # (add_prefix_space=add_special_tokens, the 2.8 contract)
        expected = text if text[0].isspace() else " " + text
        assert our_tokenizer.decode(ids) == expected


def test_unknown_tokens_fall_back_to_unk(vocab_files, our_tokenizer,
                                         ref_tokenizer):
    # shrink the vocab case: a merge output missing from vocab -> unk path
    # (both implementations use .get(token, unk))
    ids = our_tokenizer.encode("the")
    assert all(i < our_tokenizer.vocab_size for i in ids)
    assert (ref_tokenizer.encode("the", add_special_tokens=True) == ids)


def test_padding_to_max_length(our_tokenizer):
    out = our_tokenizer.encode("the cat", max_length=12, padding=True)
    assert len(out) == 12
    assert out[-1] == our_tokenizer.pad_token_id
