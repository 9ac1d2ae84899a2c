"""In-repo Whisper transcription: waveform → segments with word times.

The reference produces word-timestamp JSON by shelling out to an
external whisper binary (ref:job-queue-listener/src/helpers/whisper.ts,
ref:latentsync/utils/whisper.py:6-33); its vendored whisper also ships
a full transcribe loop (ref:latentsync/whisper/whisper/transcribe.py).
This module is the TPU-native equivalent of that capability: 30 s
windows → log-mel → WhisperEncoder → jitted greedy TextDecoder →
timestamp-token segmentation — so `serving.helpers.generate_subtitles`
and `trim_video_after_last_word` can consume in-repo transcription once
encoder/decoder weights + the vocab asset are configured.

Seek logic follows the reference transcribe loop's timestamp-driven
advance (ref:transcribe.py:150-192): if the window's decode ends with a
timestamp pair, seek to the last end-timestamp; otherwise advance a
full window.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..models.whisper import WhisperEncoder
from ..models.whisper_decoder import (
    GreedyRules,
    WhisperTextDecoder,
    beam_decode,
    build_initial_tokens,
    greedy_decode,
    tokens_to_segments,
)
from ..ops.mel import WHISPER_N_FRAMES, pad_or_trim, whisper_log_mel

_SAMPLES_PER_FRAME = 160  # 16 kHz / 100 fps mel hop
_WINDOW_SEC = 30.0


def compression_ratio(text: str) -> float:
    """(ref:whisper/utils.py:26-27) — high ratios mean degenerate
    repetition loops."""
    import zlib

    data = text.encode("utf-8")
    return len(data) / max(len(zlib.compress(data)), 1)


class WhisperTranscriber:
    """Callable transcriber: audio path (or waveform) → [{start, end,
    text, words}] — the structure `generate_subtitles` and
    `last_word_end` consume."""

    def __init__(
        self,
        config: WhisperConfig = WhisperConfig.tiny(),
        encoder_params=None,
        decoder_params=None,
        tokenizer=None,
        language: str = "en",
        dtype=jnp.float32,
        beam_size: Optional[int] = None,
        temperature=(0.0,),
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        initial_prompt: Optional[str] = None,
        condition_on_previous_text: bool = True,
    ):
        """beam_size/temperature follow the reference transcribe surface
        (ref:whisper/transcribe.py:24-27,145-147): beam search at t=0
        when beam_size is set, sampling at t>0; the temperature tuple is
        the fallback ladder walked when a decode fails the
        compression-ratio (> 2.4) or avg-logprob (< −1.0) gate."""
        import jax

        self.config = config
        self.encoder = WhisperEncoder(config, dtype=dtype)
        self.decoder = WhisperTextDecoder(config, dtype=dtype)
        if encoder_params is None:
            encoder_params = self.encoder.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, config.n_mels, 2 * config.n_audio_ctx)))
        if decoder_params is None:
            decoder_params = self.decoder.init(
                jax.random.PRNGKey(1), jnp.zeros((1, 3), jnp.int32),
                jnp.zeros((1, config.n_audio_ctx, config.n_text_state)))
        self.encoder_params = encoder_params
        self.decoder_params = decoder_params
        if tokenizer is None:
            from .tokenizer import get_tokenizer

            tokenizer = get_tokenizer(multilingual=True, language=language)
        self.tokenizer = tokenizer
        self.rules = GreedyRules(
            eot=tokenizer.eot,
            timestamp_begin=tokenizer.timestamp_begin,
            no_timestamps=tokenizer.no_timestamps,
            blank=tokenizer.encode(" ")[0],
            suppress=tokenizer.suppress_set(),
        )
        self._encode = jax.jit(
            lambda p, mel: self.encoder.apply(p, mel, include_embeddings=False))
        self.beam_size = beam_size
        self.temperature = ((temperature,) if isinstance(temperature, float)
                            else tuple(temperature))
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        # prompt conditioning (ref:whisper/transcribe.py initial_prompt /
        # condition_on_previous_text + decoding.py:526-530): the first
        # window is conditioned on initial_prompt; later windows on the
        # text decoded so far (reset after a high-temperature fallback,
        # which signals the previous window was unreliable)
        self.initial_prompt = initial_prompt
        self.condition_on_previous_text = condition_on_previous_text

    def _decode_with_fallback(self, feats, sot_sequence=None):
        """(ref:whisper/transcribe.py decode_with_fallback): walk the
        temperature ladder; retry when the decode fails the
        compression-ratio or avg-logprob gate. Beam search applies only
        at t=0; t>0 samples (ref:transcribe.py:146-147). sot_sequence
        may carry prompt/prefix conditioning (build_initial_tokens) —
        the gates only look at the SAMPLED region past it. Returns
        (tokens, avg_lp, temperature_used)."""
        sot = tuple(sot_sequence if sot_sequence is not None
                    else self.tokenizer.sot_sequence)
        sample_begin = len(sot)
        tokens = avg_lp = None
        t = 0.0
        for t in self.temperature:
            if t == 0.0 and self.beam_size:
                tokens, avg_lp = beam_decode(
                    self.decoder, self.decoder_params, feats, sot,
                    self.rules, beam_size=self.beam_size)
            else:
                tokens, avg_lp = greedy_decode(
                    self.decoder, self.decoder_params, feats, sot,
                    self.rules, temperature=float(t), seed=int(t * 10) + 7)
            needs_fallback = False
            if self.compression_ratio_threshold is not None:
                # sampled text tokens only: the forced prompt/prefix must
                # not count toward the repetition gate, and in the
                # whisper id layout every special is >= eot
                text = self.tokenizer.decode(
                    [int(tt) for tt in tokens[0][sample_begin:]
                     if tt < self.tokenizer.eot])
                if compression_ratio(text) > self.compression_ratio_threshold:
                    needs_fallback = True  # too repetitive
            if (self.logprob_threshold is not None
                    and float(avg_lp[0]) < self.logprob_threshold):
                needs_fallback = True  # average log probability too low
            if not needs_fallback:
                break
        return tokens, avg_lp, float(t)

    def __call__(self, audio_or_path) -> List[Dict]:
        if isinstance(audio_or_path, (str, os.PathLike)):
            from ..utils.media import read_audio

            audio = read_audio(str(audio_or_path))
        else:
            audio = np.asarray(audio_or_path, np.float32)

        mel = whisper_log_mel(jnp.asarray(audio, jnp.float32))
        num_frames = mel.shape[-1]
        segments: List[Dict] = []
        seek = 0
        prompt_tokens: List[int] = (
            self.tokenizer.encode(" " + self.initial_prompt.strip())
            if self.initial_prompt else [])
        while seek < num_frames:
            end = min(seek + WHISPER_N_FRAMES, num_frames)
            window = pad_or_trim(mel[:, seek:end], WHISPER_N_FRAMES)
            feats = self._encode(self.encoder_params, window[None])
            init = (build_initial_tokens(
                self.tokenizer.sot_sequence, tokenizer=self.tokenizer,
                prompt=prompt_tokens, n_ctx=self.config.n_text_ctx)
                if prompt_tokens else tuple(self.tokenizer.sot_sequence))
            tokens, _, temp_used = self._decode_with_fallback(
                feats, sot_sequence=init)
            sampled = tokens[0][len(init):]
            if self.condition_on_previous_text and temp_used <= 0.5:
                # accumulate this window's text tokens as the next
                # window's prompt; a high-temperature fallback resets
                # the context (ref:transcribe.py condition_on_previous_text)
                prompt_tokens.extend(
                    int(tt) for tt in sampled if tt < self.tokenizer.eot)
            else:
                prompt_tokens = []
            offset = seek * _SAMPLES_PER_FRAME / 16000.0
            window_segs = tokens_to_segments(
                sampled, self.tokenizer, segment_offset_sec=offset)
            segments.extend(window_segs)
            if end >= num_frames:
                break
            if window_segs and window_segs[-1]["end"] > offset:
                # timestamp-driven seek (ref:transcribe.py:150-192)
                new_seek = int(round(window_segs[-1]["end"] * 100))
            else:
                new_seek = end
            # guarantee forward progress: a last timestamp that rounds
            # back to the window start would re-decode the identical
            # window forever (greedy decode is deterministic) — fall
            # back to a full-window advance, as the reference does when
            # no usable timestamp exists
            seek = new_seek if new_seek > seek else end
        return segments


def make_transcriber(
    config: Optional[WhisperConfig] = None,
    checkpoint_path: Optional[str] = None,
    vocab_path: Optional[str] = None,
    language: str = "en",
) -> WhisperTranscriber:
    """Production factory: load encoder+decoder weights from a torch
    whisper checkpoint (`$LATENTSYNC_WHISPER_CKPT`) and the vocab from
    `$LATENTSYNC_WHISPER_VOCAB` (see docs/weights.md)."""
    from .tokenizer import get_tokenizer

    config = config or WhisperConfig.tiny()
    enc_params = dec_params = None
    checkpoint_path = checkpoint_path or os.environ.get("LATENTSYNC_WHISPER_CKPT")
    random_weights = True
    if checkpoint_path and os.path.isfile(checkpoint_path):
        from ..models.whisper_decoder import convert_whisper_decoder
        from ..utils.convert import convert_whisper_encoder, load_torch_state_dict

        state, _ = load_torch_state_dict(checkpoint_path)
        enc_params = convert_whisper_encoder(state)
        dec_params = convert_whisper_decoder(state)
        random_weights = False
    else:
        import warnings

        warnings.warn(
            "make_transcriber: no whisper checkpoint found "
            f"(LATENTSYNC_WHISPER_CKPT={checkpoint_path!r}) — encoder/"
            "decoder are RANDOMLY initialized and transcripts will be "
            "gibberish. Set the env var to a whisper .pt checkpoint "
            "(docs/weights.md).",
            stacklevel=2,
        )
    tok = get_tokenizer(multilingual=True, vocab_path=vocab_path,
                        language=language)
    t = WhisperTranscriber(config, enc_params, dec_params, tok,
                           language=language)
    t.random_weights = random_weights
    return t
