"""Whisper tokenizer: byte-level BPE + the special-token id layout.

Re-derivation of the reference's tokenizer wrapper
(ref:latentsync/whisper/whisper/tokenizer.py:1-331). The base BPE is
GPT2TokenizerFast (transformers, baked into this env); the vocab/merges
asset is NOT vendored here — point `vocab_path` (or
$LATENTSYNC_WHISPER_VOCAB) at a local copy of the reference's
`whisper/assets/multilingual` (or `gpt2`) directory and everything else
is derived.

The LANGUAGE_CODES tuple is a numerical-contract constant: Whisper's
language token ids are `sot + 1 + index` into this exact ordering
(ref:tokenizer.py:10-110,324-327), so checkpoint compatibility requires
the verbatim sequence.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Tuple

# ordering defines language token ids — contract constant, see module doc
LANGUAGE_CODES: Tuple[str, ...] = (
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl",
    "ca", "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "iw", "uk",
    "el", "ms", "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr",
    "bg", "lt", "la", "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn",
    "sr", "az", "sl", "kn", "et", "mk", "br", "eu", "is", "hy", "ne",
    "mn", "bs", "kk", "sq", "sw", "gl", "mr", "pa", "si", "km", "sn",
    "yo", "so", "af", "oc", "ka", "be", "tg", "sd", "gu", "am", "yi",
    "lo", "uz", "fo", "ht", "ps", "tk", "nn", "mt", "sa", "lb", "my",
    "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha", "ba", "jw", "su",
)

SPECIALS = (
    "<|startoftranscript|>",
    *[f"<|{code}|>" for code in LANGUAGE_CODES],
    "<|translate|>",
    "<|transcribe|>",
    "<|startoflm|>",
    "<|startofprev|>",
    "<|nospeech|>",
    "<|notimestamps|>",
)


@dataclass(frozen=True)
class WhisperTokenizer:
    """Special-token ids + encode/decode over the loaded BPE."""

    tokenizer: object  # GPT2TokenizerFast
    language: Optional[str]
    sot_sequence: Tuple[int, ...]

    def encode(self, text: str, **kw) -> List[int]:
        return self.tokenizer.encode(text, **kw)

    def decode(self, token_ids, **kw) -> str:
        return self.tokenizer.decode(token_ids, **kw)

    @property
    def eot(self) -> int:
        return self.tokenizer.eos_token_id

    def _one(self, text: str) -> int:
        toks = self.tokenizer.encode(text)
        assert len(toks) == 1, f"{text!r} is not a single token"
        return toks[0]

    @property
    def sot(self) -> int:
        return self._one("<|startoftranscript|>")

    @property
    def no_speech(self) -> int:
        return self._one("<|nospeech|>")

    @property
    def no_timestamps(self) -> int:
        return self._one("<|notimestamps|>")

    @property
    def sot_prev(self) -> int:
        """Previous-context marker prepended before prompt conditioning
        (ref:whisper/tokenizer.py sot_prev, decoding.py:530)."""
        return self._one("<|startofprev|>")

    @property
    def timestamp_begin(self) -> int:
        return self.tokenizer.all_special_ids[-1] + 1

    @property
    def sot_sequence_including_notimestamps(self) -> Tuple[int, ...]:
        return tuple(list(self.sot_sequence) + [self.no_timestamps])

    def decode_with_timestamps(self, tokens) -> str:
        """Annotate timestamp tokens as <|1.08|> (ref:tokenizer.py:144-160)."""
        out, cur = [], []
        for tok in tokens:
            if tok >= self.timestamp_begin:
                if cur:
                    out.append(self.tokenizer.decode(cur))
                    cur = []
                out.append(f"<|{(tok - self.timestamp_begin) * 0.02:.2f}|>")
            else:
                cur.append(tok)
        if cur:
            out.append(self.tokenizer.decode(cur))
        return "".join(out)

    @property
    def non_speech_tokens(self) -> Tuple[int, ...]:
        """Speaker-tag/annotation tokens to suppress (ref:tokenizer.py:236-264)."""
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』')
        symbols += "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪".split()
        miscellaneous = set("♩♪♫♬♭♮♯")
        result = {self.encode(" -")[0], self.encode(" '")[0]}
        for symbol in symbols + list(miscellaneous):
            for toks in [self.encode(symbol), self.encode(" " + symbol)]:
                if len(toks) == 1 or symbol in miscellaneous:
                    result.add(toks[0])
        return tuple(sorted(result))

    def suppress_set(self) -> Tuple[int, ...]:
        """Default suppression = non-speech + non-sampleable specials
        (ref:decoding.py:547-570 _get_suppress_tokens)."""
        extra = [self.sot, self._one("<|startofprev|>"),
                 self._one("<|startoflm|>"), self.no_speech]
        langs = [self.sot + 1 + i for i in range(len(LANGUAGE_CODES))]
        trans = [self._one("<|translate|>"), self._one("<|transcribe|>")]
        return tuple(sorted(set(self.non_speech_tokens)
                            | set(extra) | set(langs) | set(trans)))


@lru_cache(maxsize=None)
def build_tokenizer(vocab_path: str):
    from transformers import GPT2TokenizerFast

    os.environ["TOKENIZERS_PARALLELISM"] = "false"
    tok = GPT2TokenizerFast.from_pretrained(vocab_path)
    tok.add_special_tokens(dict(additional_special_tokens=list(SPECIALS)))
    return tok


def get_tokenizer(
    multilingual: bool = True,
    *,
    vocab_path: Optional[str] = None,
    task: Optional[str] = "transcribe",
    language: Optional[str] = "en",
) -> WhisperTokenizer:
    """Build the tokenizer from a local vocab directory.

    vocab_path defaults to $LATENTSYNC_WHISPER_VOCAB. The directory is
    a standard GPT-2 tokenizer bundle (vocab.json + merges.txt) — the
    reference ships it at whisper/assets/{multilingual,gpt2}
    (ref:tokenizer.py:273-291)."""
    vocab_path = vocab_path or os.environ.get("LATENTSYNC_WHISPER_VOCAB")
    if not vocab_path:
        raise FileNotFoundError(
            "No Whisper vocab configured: set $LATENTSYNC_WHISPER_VOCAB to a "
            "GPT-2 tokenizer directory (vocab.json + merges.txt), e.g. the "
            "reference's whisper/assets/multilingual."
        )
    if not multilingual:
        task, language = None, None
    if language is not None and language not in LANGUAGE_CODES:
        raise ValueError(f"Unsupported language: {language}")
    tok = build_tokenizer(vocab_path)
    sot = tok.encode("<|startoftranscript|>")[0]
    seq = [sot]
    if language is not None:
        seq.append(sot + 1 + LANGUAGE_CODES.index(language))
    if task is not None:
        code = "<|transcribe|>" if task == "transcribe" else "<|translate|>"
        seq.append(tok.encode(code)[0])
    return WhisperTokenizer(tokenizer=tok, language=language,
                            sot_sequence=tuple(seq))
