"""End-to-end exercise of the espeak-ng SUBPROCESS G2P path with a fake
binary on PATH.

The real espeak-ng engine is not installable in this image (VERDICT r4
missing #4), so the subprocess plumbing — argv construction, per-clause
invocation, stdout decoding, and the piper reshape — had only ever run
against hand-written IPA strings passed directly to
``shape_espeak_clauses``.  These tests stand up a fake ``espeak-ng``
executable that emits output in the REAL engine's ``-q --ipa`` format
(one line of IPA per invocation, UTF-8, stress marks, tie bars,
language-switch flags, embedded newlines between clauses espeak itself
splits) and drive the full ``espeak_phonemize`` dispatch through it:
backend discovery via ``shutil.which`` -> ``_espeak_binary_phonemize``
-> token stream.

Ref behavioral spec: zipvoice/tokenizer.py:32-39 (piper phonemize_espeak
call) and 321-329 (token stream the tokenizers consume).
"""

import os
import stat
import subprocess
import sys

import pytest

from zipvoice_tpu.text.tokenizer import (
    active_g2p_backend,
    espeak_phonemize,
)

# skip everywhere piper_phonemize is importable: the dispatch would never
# reach the subprocess backend there
piper_missing = active_g2p_backend("en-us") != "piper"
pytestmark = pytest.mark.skipif(
    not piper_missing, reason="piper_phonemize installed; subprocess path unreachable"
)


FAKE_ESPEAK = r"""#!/usr/bin/env python3
# Fake espeak-ng: validates argv shape, then prints canned IPA in the
# real engine's `-q --ipa` output format (UTF-8, newline-terminated).
import sys

args = sys.argv[1:]
assert args[0] == "-q", args          # quiet: no audio
assert args[1] == "--ipa", args       # IPA phoneme output
assert args[2] == "-v", args
lang = args[3]
assert args[4] == "--", args          # text must be positional-safe
text = args[5]

CANNED = {
    "hello world": "həlˈəʊ wˈɜːld",
    # espeak splits long inputs into clause lines itself
    "two clauses here": "tˈuː\nklˈɔːzəz hˈɪə",
    # language-switch flag + tie bar, as the real engine emits for
    # mixed-language text
    "ciao": "(it)t͡ʃˈaʊ(en)",
    "hmm": "hˈʌm",
}
out = CANNED.get(text.lower())
if out is None:
    sys.stderr.write("fake-espeak: unexpected text %r\n" % text)
    sys.exit(1)
sys.stdout.write(out + "\n")
"""


@pytest.fixture()
def fake_espeak_path(tmp_path, monkeypatch):
    exe = tmp_path / "espeak-ng"
    exe.write_text(FAKE_ESPEAK, encoding="utf-8")
    exe.chmod(exe.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
    return exe


def test_backend_discovery_flips_to_subprocess(fake_espeak_path):
    assert active_g2p_backend("en-us") == "espeak-ng"
    assert active_g2p_backend("de") == "espeak-ng"  # non-EN now covered too


def test_fake_binary_emits_real_format(fake_espeak_path):
    """Sanity: the fixture binary itself behaves like espeak-ng -q --ipa."""
    res = subprocess.run(
        [str(fake_espeak_path), "-q", "--ipa", "-v", "en-us", "--", "hello world"],
        capture_output=True,
        text=True,
        check=True,
    )
    assert res.stdout == "həlˈəʊ wˈɜːld\n"


def test_subprocess_single_clause(fake_espeak_path):
    toks = espeak_phonemize("hello world.", "en-us")
    # piper semantics: per-char tokens, space kept, clause punct appended,
    # stress marks are their own tokens
    assert toks == list("həl") + ["ˈ"] + list("əʊ") + [" "] + ["w", "ˈ"] + list("ɜːld") + ["."]


def test_subprocess_multi_clause_punctuation(fake_espeak_path):
    """Each clause is a separate espeak invocation; punctuation tokens are
    re-attached by the reshape, and newlines espeak emits inside one
    invocation's output act as word separators."""
    toks = espeak_phonemize("two clauses here, hmm.", "en-us")
    assert "," in toks and "." in toks
    # the newline espeak printed between 'two' and 'clauses here' became a space
    joined = "".join(toks)
    assert joined == "tˈuː klˈɔːzəz hˈɪə, hˈʌm."


def test_subprocess_strips_language_switch_flags(fake_espeak_path):
    """(it)/(en) language-switch markers and tie bars never reach the
    token stream (piper_phonemize strips them; the reshape must too)."""
    toks = espeak_phonemize("ciao", "en-us")
    assert toks == ["t", "ʃ", "ˈ", "a", "ʊ"]
    assert not any("(" in t or ")" in t or "͡" in t for t in toks)


def test_subprocess_failure_raises(fake_espeak_path):
    """A non-zero espeak exit must surface, not produce silent garbage."""
    with pytest.raises(subprocess.CalledProcessError):
        espeak_phonemize("not in the canned table", "en-us")


def test_tokenizer_uses_subprocess_backend(fake_espeak_path, tmp_path):
    """EspeakTokenizer end-to-end over the subprocess engine: ids match the
    vendored piper map for every produced token."""
    from zipvoice_tpu.text.espeak_map import VENDORED_ESPEAK_MAP
    from zipvoice_tpu.text.tokenizer import EspeakTokenizer

    # tokens.txt covering the map, as released checkpoints ship
    tokens_file = tmp_path / "tokens.txt"
    lines = [f"{tok}\t{i}" for tok, i in sorted(VENDORED_ESPEAK_MAP.items(), key=lambda kv: kv[1])]
    tokens_file.write_text("\n".join(lines) + "\n", encoding="utf-8")

    tok = EspeakTokenizer(token_file=str(tokens_file), lang="en-us")
    ids = tok.texts_to_token_ids(["hello world."])[0]
    assert ids, "empty id stream"
    id_of = dict(VENDORED_ESPEAK_MAP)
    expect = espeak_phonemize("hello world.", "en-us")
    assert ids == [id_of[t] for t in expect if t in id_of]
