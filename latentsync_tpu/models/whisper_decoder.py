"""Whisper text decoder + jitted greedy transcription.

Re-derivation of the vendored Whisper TextDecoder and the greedy slice
of its decoding loop (ref:latentsync/whisper/whisper/model.py:176-217,
decoding.py:387-441,444-729). The reference runs decoding as a Python
loop of single-token forwards with hook-based kv caches; here the whole
loop is ONE `lax.while_loop` under jit:

- fixed-size self-attention kv caches (B, n_ctx, n_state) carried as
  loop state and updated with `dynamic_update_slice` — static shapes,
  no host round trips per token;
- cross-attention keys/values over the audio context computed once
  before the loop (the reference's `kv_cache` hook for xa,
  ref:model.py:80-84);
- the greedy logit filters (SuppressBlank, SuppressTokens,
  ApplyTimestampRules — ref:decoding.py:387-441) are pure jnp masking
  inside the loop, including the timestamp pairing rule and the
  timestamp-vs-text logsumexp rule;
- the SOT prompt is folded into the same loop: while the position is
  inside the prompt, the "sampled" token is forced to the prompt token,
  so prefill and decode share one compiled step.

Weights drop in via `convert_whisper_decoder` from the reference
checkpoint's `decoder.*` keys (the vocab asset itself ships with the
tokenizer — see audio/tokenizer.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..ops.attention import dot_product_attention


class _DecoderMHA(nn.Module):
    """Whisper attention projections: q/v/out biased, k unbiased
    (ref:whisper/model.py:57-63)."""

    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.query = nn.Dense(self.n_state, dtype=self.dtype, name="query")
        self.key = nn.Dense(self.n_state, use_bias=False, dtype=self.dtype,
                            name="key")
        self.value = nn.Dense(self.n_state, dtype=self.dtype, name="value")
        self.out = nn.Dense(self.n_state, dtype=self.dtype, name="out")

    def _split(self, x):
        b, t, _ = x.shape
        d = self.n_state // self.n_head
        return x.reshape(b, t, self.n_head, d)

    def __call__(self, x, xa=None, mask=None):
        """Full-sequence attention (teacher-forced / parity path)."""
        ctx = x if xa is None else xa
        q = self._split(self.query(x))
        k = self._split(self.key(ctx))
        v = self._split(self.value(ctx))
        o = dot_product_attention(q, k, v, mask=mask)
        return self.out(o.reshape(x.shape[0], x.shape[1], self.n_state))

    def kv(self, xa):
        """Precompute cross-attention keys/values once per audio clip."""
        return self._split(self.key(xa)), self._split(self.value(xa))

    def step(self, x1, pos, k_cache, v_cache):
        """One-token self-attention against a fixed-size cache.

        x1: (B, 1, C); caches: (B, n_ctx, H, D). Returns (out, caches)."""
        b = x1.shape[0]
        d = self.n_state // self.n_head
        q = self._split(self.query(x1))          # (B, 1, H, D)
        k1 = self._split(self.key(x1))
        v1 = self._split(self.value(x1))
        k_cache = jax.lax.dynamic_update_slice(k_cache, k1, (0, pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v1, (0, pos, 0, 0))
        # mask positions beyond `pos` (future slots of the fixed cache)
        idx = jnp.arange(k_cache.shape[1])
        mask = jnp.where(idx <= pos, 0.0, -jnp.inf)[None, None, None, :]
        o = dot_product_attention(q, k_cache, v_cache, mask=mask)
        return self.out(o.reshape(b, 1, self.n_state)), k_cache, v_cache

    def cross_step(self, x1, xa_k, xa_v):
        q = self._split(self.query(x1))
        o = dot_product_attention(q, xa_k, xa_v)
        return self.out(o.reshape(x1.shape[0], 1, self.n_state))


class _DecoderBlock(nn.Module):
    """Pre-LN block with cross-attention (ref:whisper/model.py:103-128)."""

    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.attn_ln = nn.LayerNorm(dtype=jnp.float32, name="attn_ln")
        self.attn = _DecoderMHA(self.n_state, self.n_head, dtype=self.dtype,
                                name="attn")
        self.cross_attn_ln = nn.LayerNorm(dtype=jnp.float32,
                                          name="cross_attn_ln")
        self.cross_attn = _DecoderMHA(self.n_state, self.n_head,
                                      dtype=self.dtype, name="cross_attn")
        self.mlp_ln = nn.LayerNorm(dtype=jnp.float32, name="mlp_ln")
        self.mlp_0 = nn.Dense(self.n_state * 4, dtype=self.dtype, name="mlp_0")
        self.mlp_2 = nn.Dense(self.n_state, dtype=self.dtype, name="mlp_2")

    def _mlp(self, x):
        return self.mlp_2(nn.gelu(self.mlp_0(x), approximate=False))

    def __call__(self, x, xa, mask):
        x = x + self.attn(self.attn_ln(x).astype(self.dtype), mask=mask)
        x = x + self.cross_attn(self.cross_attn_ln(x).astype(self.dtype), xa=xa)
        return x + self._mlp(self.mlp_ln(x).astype(self.dtype))

    def kv(self, xa):
        return self.cross_attn.kv(xa)

    def step(self, x1, pos, k_cache, v_cache, xa_k, xa_v):
        h, k_cache, v_cache = self.attn.step(
            self.attn_ln(x1).astype(self.dtype), pos, k_cache, v_cache)
        x1 = x1 + h
        x1 = x1 + self.cross_attn.cross_step(
            self.cross_attn_ln(x1).astype(self.dtype), xa_k, xa_v)
        return x1 + self._mlp(self.mlp_ln(x1).astype(self.dtype)), k_cache, v_cache


class WhisperTextDecoder(nn.Module):
    """tokens (B, T) + audio features (B, Ta, C) → logits (B, T, vocab)
    (ref:whisper/model.py:176-217): learned positions, causal mask,
    logits tied to the token embedding."""

    config: WhisperConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.02), (cfg.n_vocab, cfg.n_text_state),
            jnp.float32,
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01), (cfg.n_text_ctx, cfg.n_text_state),
            jnp.float32,
        )
        self.blocks_list = [
            _DecoderBlock(cfg.n_text_state, cfg.n_text_head, dtype=self.dtype,
                          name=f"blocks_{i}")
            for i in range(cfg.n_text_layer)
        ]
        self.ln = nn.LayerNorm(dtype=jnp.float32, name="ln")

    def __call__(self, tokens, audio_features):
        emb = jnp.asarray(self.token_embedding)
        t = tokens.shape[-1]
        x = emb[tokens] + self.positional_embedding[:t]
        x = x.astype(self.dtype)
        xa = audio_features.astype(self.dtype)
        causal = jnp.where(
            jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0, -jnp.inf
        )[None, None, :, :]
        for blk in self.blocks_list:
            x = blk(x, xa, causal)
        x = self.ln(x)
        return (x @ emb.T.astype(x.dtype)).astype(jnp.float32)

    def audio_kv(self, audio_features):
        """Per-layer cross-attention k/v, computed once per clip."""
        xa = audio_features.astype(self.dtype)
        ks, vs = [], []
        for blk in self.blocks_list:
            k, v = blk.kv(xa)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)  # (L, B, Ta, H, D)

    def step(self, token, pos, k_caches, v_caches, xa_k, xa_v):
        """One decode step. token: (B,) int32; caches (L, B, n_ctx, H, D).
        Returns (logits (B, vocab), new caches)."""
        emb = jnp.asarray(self.token_embedding)
        x = emb[token][:, None, :] + jax.lax.dynamic_slice_in_dim(
            self.positional_embedding, pos, 1, axis=0)[None]
        x = x.astype(self.dtype)
        new_k, new_v = [], []
        for i, blk in enumerate(self.blocks_list):
            x, kc, vc = blk.step(x, pos, k_caches[i], v_caches[i],
                                 xa_k[i], xa_v[i])
            new_k.append(kc)
            new_v.append(vc)
        x = self.ln(x)
        logits = (x[:, 0, :] @ emb.T.astype(x.dtype)).astype(jnp.float32)
        return logits, jnp.stack(new_k), jnp.stack(new_v)


# ---------------------------------------------------------------------------
# greedy decoding with the reference's logit filters, as one jitted loop
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GreedyRules:
    """Static ids driving the in-loop logit filters
    (ref:decoding.py:387-441, tokenizer.py:236-264)."""

    eot: int
    timestamp_begin: int
    no_timestamps: int
    blank: int
    suppress: Tuple[int, ...]  # non-speech + special tokens
    max_initial_timestamp_index: Optional[int] = 50  # 1.0 s (ref:decoding.py:595)
    use_timestamps: bool = True


def _apply_logit_filters(logits, tokens_buf, pos, rules, sample_begin,
                         suppress_mask):
    """The reference's logit-filter stack (SuppressTokens, SuppressBlank,
    ApplyTimestampRules — ref:decoding.py:387-441) as pure jnp masking.
    logits: (N, vocab); tokens_buf: (N, L); shared by greedy and beam."""
    vocab = logits.shape[-1]
    logits = logits + suppress_mask[None, :]

    is_sampling = pos >= sample_begin - 1
    # SuppressBlank at the first sampled position (ref:decoding.py:392)
    first = pos == sample_begin - 1
    blank_mask = jnp.zeros((vocab,)).at[
        np.array([rules.blank, rules.eot])].set(-jnp.inf)
    logits = jnp.where(first, logits + blank_mask[None, :], logits)

    if rules.use_timestamps:
        ts0 = rules.timestamp_begin
        idx = jnp.arange(vocab)
        # timestamp pairing (ref:decoding.py:418-428)
        last = tokens_buf[:, pos]
        penult = tokens_buf[:, jnp.maximum(pos - 1, 0)]
        last_ts = (last >= ts0) & (pos >= sample_begin)
        pen_ts = (penult >= ts0) | (pos - 1 < sample_begin)
        kill_ts = (last_ts & pen_ts)[:, None] & (idx >= ts0)[None, :]
        kill_text = (last_ts & ~pen_ts)[:, None] & (idx < rules.eot)[None, :]
        logits = jnp.where(kill_ts | kill_text, -jnp.inf, logits)
        # max_initial_timestamp (ref:decoding.py:430-433)
        if rules.max_initial_timestamp_index is not None:
            last_allowed = ts0 + rules.max_initial_timestamp_index
            logits = jnp.where(
                first & (idx > last_allowed)[None, :], -jnp.inf, logits)
        # timestamp-sum vs max-text rule (ref:decoding.py:435-441)
        lp = jax.nn.log_softmax(logits, axis=-1)
        ts_lp = jax.nn.logsumexp(
            jnp.where((idx >= ts0)[None, :], lp, -jnp.inf), axis=-1)
        text_lp = jnp.max(jnp.where((idx < ts0)[None, :], lp, -jnp.inf),
                          axis=-1)
        force_ts = (ts_lp > text_lp)[:, None] & (idx < ts0)[None, :]
        logits = jnp.where(force_ts & is_sampling, -jnp.inf, logits)
    return logits


def build_initial_tokens(
    sot_sequence: Sequence[int],
    *,
    tokenizer=None,
    prompt=None,
    prefix=None,
    sample_len: Optional[int] = None,
    n_ctx: int = 448,
) -> Tuple[int, ...]:
    """DecodingOptions prompt/prefix conditioning
    (ref:whisper/decoding.py:512-533 _get_initial_tokens):

    - `prefix` (text or token list) appends AFTER the SOT sequence —
      forced first tokens of the CURRENT segment (trimmed to the last
      n_ctx//2 − sample_len when sample_len bounds the decode);
    - `prompt` (text or token list) prepends `[sot_prev] + tokens`
      BEFORE the SOT sequence — previous-context conditioning (the
      transcribe loop's condition_on_previous_text path), trimmed to
      the last n_ctx//2 − 1 tokens.

    Both count toward sample_begin: they are forced, not sampled, and
    do not contribute to avg_logprob."""
    tokens = list(sot_sequence)
    if prefix:
        prefix_tokens = (
            tokenizer.encode(" " + prefix.strip())
            if isinstance(prefix, str) else list(prefix))
        if sample_len is not None:
            max_prefix_len = n_ctx // 2 - sample_len
            prefix_tokens = prefix_tokens[-max_prefix_len:]
        tokens = tokens + prefix_tokens
    if prompt:
        prompt_tokens = (
            tokenizer.encode(" " + prompt.strip())
            if isinstance(prompt, str) else list(prompt))
        tokens = ([tokenizer.sot_prev]
                  + prompt_tokens[-(n_ctx // 2 - 1):] + tokens)
    return tuple(tokens)


def greedy_decode(
    decoder: WhisperTextDecoder,
    params,
    audio_features: jnp.ndarray,
    sot_sequence: Sequence[int],
    rules: GreedyRules,
    sample_len: Optional[int] = None,
    temperature: float = 0.0,
    seed: int = 0,
    prompt_text=None,
    prefix_text=None,
    tokenizer=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy transcription of (B, Ta, C) audio features.

    Returns (tokens (B, L) int32 including the SOT prompt, with eot
    padding, avg_logprob (B,)). The whole loop — prompt prefill included
    — is one lax.while_loop under jit. temperature > 0 samples from
    logits/T instead of argmax (ref:decoding.py:260-263 GreedyDecoder) —
    the fallback ladder's retry mode (transcribe decode_with_fallback).
    prompt_text/prefix_text: DecodingOptions-style conditioning folded
    into the forced token sequence (ref:decoding.py:512-533)."""
    cfg = decoder.config
    b = audio_features.shape[0]
    n_ctx = cfg.n_text_ctx
    if prompt_text or prefix_text:
        sot_sequence = build_initial_tokens(
            sot_sequence, tokenizer=tokenizer, prompt=prompt_text,
            prefix=prefix_text, sample_len=sample_len, n_ctx=n_ctx)
    sample_len = sample_len or n_ctx // 2
    prompt = np.asarray(sot_sequence, np.int32)
    sample_begin = len(prompt)
    total_len = min(n_ctx, sample_begin + sample_len)
    d = cfg.n_text_state // cfg.n_text_head
    vocab = cfg.n_vocab

    suppress_mask = np.zeros((vocab,), np.float32)
    suppress_mask[list(rules.suppress)] = -np.inf
    if rules.use_timestamps:
        suppress_mask[rules.no_timestamps] = -np.inf
    suppress_mask = jnp.asarray(suppress_mask)

    def fold(tokens_buf, pos, kc, vc, finished, sum_lp, xa_k, xa_v):
        tok = tokens_buf[:, pos]
        logits, kc, vc = decoder.apply(
            params, tok, pos, kc, vc, xa_k, xa_v, method="step")
        logits = _apply_logit_filters(logits, tokens_buf, pos, rules,
                                      sample_begin, suppress_mask)

        lp = jax.nn.log_softmax(logits, axis=-1)
        if temperature > 0:
            nxt = jax.random.categorical(
                jax.random.fold_in(jax.random.PRNGKey(seed), pos),
                logits / temperature, axis=-1).astype(jnp.int32)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # inside the prompt: force the next prompt token instead
        in_prompt = pos + 1 < sample_begin
        forced = jnp.asarray(prompt)[jnp.minimum(pos + 1, sample_begin - 1)]
        nxt = jnp.where(in_prompt, forced, nxt)
        nxt = jnp.where(finished, rules.eot, nxt)
        sum_lp = sum_lp + jnp.where(
            finished | in_prompt, 0.0, jnp.take_along_axis(
                lp, nxt[:, None], axis=-1)[:, 0])
        finished = finished | ((nxt == rules.eot) & ~in_prompt)
        tokens_buf = tokens_buf.at[:, pos + 1].set(nxt)
        return tokens_buf, kc, vc, finished, sum_lp

    @jax.jit
    def run(audio_features):
        xa_k, xa_v = decoder.apply(params, audio_features, method="audio_kv")
        tokens_buf = jnp.full((b, total_len), rules.eot, jnp.int32)
        tokens_buf = tokens_buf.at[:, :sample_begin].set(
            jnp.asarray(prompt)[None, :])
        kc = jnp.zeros((cfg.n_text_layer, b, n_ctx, cfg.n_text_head, d),
                       audio_features.dtype)
        vc = jnp.zeros_like(kc)

        def cond(state):
            pos, _, _, _, finished, _ = state
            return (pos < total_len - 1) & ~jnp.all(finished)

        def body(state):
            pos, buf, kc, vc, fin, slp = state
            buf, kc, vc, fin, slp = fold(buf, pos, kc, vc, fin, slp,
                                         xa_k, xa_v)
            return pos + 1, buf, kc, vc, fin, slp

        state = (0, tokens_buf, kc, vc,
                 jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32))
        _, buf, _, _, _, slp = jax.lax.while_loop(cond, body, state)
        n_sampled = jnp.maximum(
            jnp.sum((buf[:, sample_begin:] != rules.eot), axis=-1) + 1, 1)
        return buf, slp / n_sampled

    tokens, avg_lp = run(audio_features)
    return np.asarray(tokens), np.asarray(avg_lp)


def beam_decode(
    decoder: WhisperTextDecoder,
    params,
    audio_features: jnp.ndarray,
    sot_sequence: Sequence[int],
    rules: GreedyRules,
    beam_size: int = 5,
    sample_len: Optional[int] = None,
    patience: Optional[float] = None,
    length_penalty: Optional[float] = None,
    prompt_text=None,
    prefix_text=None,
    tokenizer=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Beam-search transcription (ref:decoding.py:281-369
    BeamSearchDecoder + :173-197 MaximumLikelihoodRanker), whole loop
    under jit.

    Semantics matched to the reference:
    - per beam, top (beam_size+1) token candidates; merged per audio and
      scanned in score order, keeping the first beam_size unfinished as
      the new beams (the +1 covers an eot candidate consuming a slot);
    - eot candidates encountered before the beam_size-th live one join
      the finished pool, capped at max_candidates = beam_size·patience;
    - the reference dedups identical sequences via its dict keying — in
      practice that only triggers at the first sampled position (all
      beams start identical), reproduced here by masking beams 1.. at
      that step;
    - finalize pads under-full finished pools with the live beams
      (+eot), then ranks by sum_logprob / length (length_penalty=None →
      simple length normalization).

    Returns (tokens (B, L) best sequence incl. prompt, avg_logprob (B,)
    per ref:decoding.py:716-718)."""
    cfg = decoder.config
    b = audio_features.shape[0]
    nb = beam_size
    n_ctx = cfg.n_text_ctx
    if prompt_text or prefix_text:
        sot_sequence = build_initial_tokens(
            sot_sequence, tokenizer=tokenizer, prompt=prompt_text,
            prefix=prefix_text, sample_len=sample_len, n_ctx=n_ctx)
    sample_len = sample_len or n_ctx // 2
    prompt = np.asarray(sot_sequence, np.int32)
    sample_begin = len(prompt)
    total_len = min(n_ctx, sample_begin + sample_len)
    d = cfg.n_text_state // cfg.n_text_head
    vocab = cfg.n_vocab
    max_candidates = int(round(nb * (patience or 1.0)))
    pool = nb * (nb + 1)

    suppress_mask = np.zeros((vocab,), np.float32)
    suppress_mask[list(rules.suppress)] = -np.inf
    if rules.use_timestamps:
        suppress_mask[rules.no_timestamps] = -np.inf
    suppress_mask = jnp.asarray(suppress_mask)

    @jax.jit
    def run(audio_features):
        # beams ride the batch dim: xa duplicated per beam
        xa = jnp.repeat(audio_features, nb, axis=0)
        xa_k, xa_v = decoder.apply(params, xa, method="audio_kv")
        buf = jnp.full((b, nb, total_len), rules.eot, jnp.int32)
        buf = buf.at[:, :, :sample_begin].set(jnp.asarray(prompt)[None, None])
        kc = jnp.zeros((cfg.n_text_layer, b * nb, n_ctx, cfg.n_text_head, d),
                       audio_features.dtype)
        vc = jnp.zeros_like(kc)
        sum_lp = jnp.zeros((b, nb), jnp.float32)
        fin_tok = jnp.full((b, max_candidates, total_len), rules.eot,
                           jnp.int32)
        fin_lp = jnp.full((b, max_candidates), -jnp.inf, jnp.float32)
        fin_cnt = jnp.zeros((b,), jnp.int32)

        def cond(state):
            pos = state[0]
            fin_cnt = state[7]
            return (pos < total_len - 1) & ~jnp.all(fin_cnt >= max_candidates)

        def body(state):
            pos, buf, kc, vc, sum_lp, fin_tok, fin_lp, fin_cnt = state
            flat = buf.reshape(b * nb, total_len)
            tok = flat[:, pos]
            logits, kc, vc = decoder.apply(
                params, tok, pos, kc, vc, xa_k, xa_v, method="step")

            in_prompt = pos + 1 < sample_begin
            first = pos == sample_begin - 1

            logits = _apply_logit_filters(logits, flat, pos, rules,
                                          sample_begin, suppress_mask)
            lp = jax.nn.log_softmax(logits, axis=-1)          # (b·nb, V)
            top_lp, top_tok = jax.lax.top_k(lp, nb + 1)       # (b·nb, nb+1)
            cand = sum_lp.reshape(b * nb, 1) + top_lp
            # first sampled position: all beams identical — keep beam 0
            # only (the reference's dict dedup, see docstring)
            beam_of = jnp.tile(jnp.arange(nb), b).reshape(b * nb, 1)
            cand = jnp.where(first & (beam_of > 0), -jnp.inf, cand)

            cand = cand.reshape(b, pool)
            ctok = top_tok.reshape(b, pool)
            csrc = jnp.repeat(jnp.arange(nb), nb + 1)[None, :]  # beam idx
            csrc = jnp.broadcast_to(csrc, (b, pool))

            order = jnp.argsort(-cand, axis=-1)
            cand_s = jnp.take_along_axis(cand, order, axis=-1)
            ctok_s = jnp.take_along_axis(ctok, order, axis=-1)
            csrc_s = jnp.take_along_axis(csrc, order, axis=-1)

            is_eot = ctok_s == rules.eot
            live_cum = jnp.cumsum((~is_eot).astype(jnp.int32), axis=-1)
            # new beam k = first pool position with live_cum == k+1
            tgt = jnp.arange(1, nb + 1)
            pick = jax.vmap(
                lambda lc: jnp.searchsorted(lc, tgt, side="left"))(live_cum)
            new_tok = jnp.take_along_axis(ctok_s, pick, axis=-1)
            new_src = jnp.take_along_axis(csrc_s, pick, axis=-1)
            new_lp = jnp.take_along_axis(cand_s, pick, axis=-1)

            # finished candidates: eot seen before the nb-th live pick
            keep_fin = is_eot & (live_cum < nb) & ~in_prompt & \
                jnp.isfinite(cand_s)
            fin_rank = jnp.cumsum(keep_fin.astype(jnp.int32), axis=-1) - 1
            slot = fin_cnt[:, None] + fin_rank
            ok = keep_fin & (slot < max_candidates)
            bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, pool))
            flat_slot = jnp.where(ok, bidx * max_candidates + slot,
                                  b * max_candidates)
            fin_lp = fin_lp.reshape(-1).at[flat_slot.reshape(-1)].set(
                cand_s.reshape(-1), mode="drop").reshape(b, max_candidates)
            # finished sequence = its source beam's buffer (eot-padded)
            src_rows = jnp.take_along_axis(
                buf, csrc_s[:, :, None], axis=1)         # (b, pool, L)
            fin_tok = fin_tok.reshape(-1, total_len).at[
                flat_slot.reshape(-1)].set(
                src_rows.reshape(-1, total_len), mode="drop"
            ).reshape(b, max_candidates, total_len)
            fin_cnt = jnp.minimum(
                fin_cnt + jnp.sum(keep_fin, axis=-1), max_candidates)

            # prompt phase: force the prompt token on every beam, no
            # reordering, scores unchanged
            forced = jnp.asarray(prompt)[jnp.minimum(pos + 1,
                                                     sample_begin - 1)]
            ident = jnp.broadcast_to(jnp.arange(nb)[None], (b, nb))
            new_src = jnp.where(in_prompt, ident, new_src)
            new_tok = jnp.where(in_prompt, forced, new_tok)
            new_lp = jnp.where(in_prompt, sum_lp, new_lp)

            # reorder beams: token buffers and kv caches follow src
            buf = jnp.take_along_axis(buf, new_src[:, :, None], axis=1)
            buf = buf.at[:, :, pos + 1].set(new_tok)
            flat_src = (jnp.arange(b)[:, None] * nb + new_src).reshape(-1)
            kc = kc[:, flat_src]
            vc = vc[:, flat_src]
            return (pos + 1, buf, kc, vc, new_lp, fin_tok, fin_lp, fin_cnt)

        state = (0, buf, kc, vc, sum_lp, fin_tok, fin_lp, fin_cnt)
        _, buf, _, _, sum_lp, fin_tok, fin_lp, fin_cnt = jax.lax.while_loop(
            cond, body, state)
        return buf, sum_lp, fin_tok, fin_lp, fin_cnt

    buf, sum_lp, fin_tok, fin_lp, fin_cnt = map(np.asarray,
                                                run(audio_features))

    # finalize + rank on host (ref:decoding.py:352-369, 173-197)
    out_tokens = np.full((b, total_len), rules.eot, np.int32)
    out_avg_lp = np.zeros((b,), np.float32)
    for i in range(b):
        seqs = [fin_tok[i, j] for j in range(int(fin_cnt[i]))]
        lps = [float(fin_lp[i, j]) for j in range(int(fin_cnt[i]))]
        if len(seqs) < beam_size:  # pad with live beams + eot
            for j in np.argsort(-sum_lp[i]):
                seqs.append(buf[i, j])
                lps.append(float(sum_lp[i, j]))
                if len(seqs) >= beam_size:
                    break
        def _len(seq):
            body_ = seq[sample_begin:]
            eots = np.nonzero(body_ == rules.eot)[0]
            return int(eots[0]) if len(eots) else len(body_)
        if length_penalty is None:
            scores = [lp / max(_len(s), 1) for s, lp in zip(seqs, lps)]
        else:
            scores = [lp / (((5 + _len(s)) / 6) ** length_penalty)
                      for s, lp in zip(seqs, lps)]
        best = int(np.argmax(scores))
        out_tokens[i] = seqs[best]
        out_avg_lp[i] = lps[best] / (_len(seqs[best]) + 1)
    return out_tokens, out_avg_lp


# ---------------------------------------------------------------------------
# segments + word timestamps
# ---------------------------------------------------------------------------


def tokens_to_segments(
    tokens: np.ndarray,
    tokenizer,
    *,
    segment_offset_sec: float = 0.0,
    precision: float = 0.02,
) -> List[Dict]:
    """Token stream → [{start, end, text, words}] using timestamp tokens
    (the reference extracts the same structure in transcribe.py's
    consume loop; word times are apportioned by character length within
    each segment — an approximation of the reference production path,
    which derives them from cross-attention alignment in the external
    whisper CLI)."""
    ts0 = tokenizer.timestamp_begin
    eot = tokenizer.eot
    segments: List[Dict] = []
    cur_text: List[int] = []
    cur_start: Optional[float] = None
    for tok in np.asarray(tokens).tolist():
        if tok == eot:
            continue
        if tok >= ts0:
            t = (tok - ts0) * precision + segment_offset_sec
            if cur_start is None:
                cur_start = t
            elif cur_text:
                text = tokenizer.decode(cur_text)
                segments.append(_with_words(text, cur_start, t))
                cur_text, cur_start = [], t
            else:
                cur_start = t
        elif tok < ts0 and not _is_special(tok, tokenizer):
            if cur_start is None:
                cur_start = segment_offset_sec
            cur_text.append(tok)
    if cur_text:
        end = (cur_start or 0.0) + 0.02 * len(cur_text)
        segments.append(_with_words(tokenizer.decode(cur_text),
                                    cur_start or 0.0, end))
    return segments


def _is_special(tok: int, tokenizer) -> bool:
    return tok >= tokenizer.sot and tok < tokenizer.timestamp_begin


def _with_words(text: str, start: float, end: float) -> Dict:
    words = text.split()
    total_chars = max(sum(len(w) for w in words), 1)
    span = end - start
    out, t = [], start
    for w in words:
        dt = span * len(w) / total_chars
        out.append({"word": w, "start": round(t, 3), "end": round(t + dt, 3)})
        t += dt
    return {"start": round(start, 3), "end": round(end, 3),
            "text": text.strip(), "words": out}


# ---------------------------------------------------------------------------
# weight converter (decoder.* keys of the reference checkpoint)
# ---------------------------------------------------------------------------


def convert_whisper_decoder(state: Dict[str, np.ndarray]) -> Dict:
    """torch `decoder.*` state dict → flax params for WhisperTextDecoder."""

    def lin(prefix, has_bias=True):
        out = {"kernel": np.ascontiguousarray(
            np.asarray(state[prefix + ".weight"]).T)}
        if has_bias:
            out["bias"] = np.asarray(state[prefix + ".bias"])
        return out

    def ln(prefix):
        return {"scale": np.asarray(state[prefix + ".weight"]),
                "bias": np.asarray(state[prefix + ".bias"])}

    n_layer = 1 + max(
        int(k.split(".")[2]) for k in state if k.startswith("decoder.blocks."))
    params = {
        "token_embedding": np.asarray(state["decoder.token_embedding.weight"]),
        "positional_embedding": np.asarray(state["decoder.positional_embedding"]),
        "ln": ln("decoder.ln"),
    }
    for i in range(n_layer):
        p = f"decoder.blocks.{i}"
        params[f"blocks_{i}"] = {
            "attn_ln": ln(f"{p}.attn_ln"),
            "attn": {
                "query": lin(f"{p}.attn.query"),
                "key": lin(f"{p}.attn.key", has_bias=False),
                "value": lin(f"{p}.attn.value"),
                "out": lin(f"{p}.attn.out"),
            },
            "cross_attn_ln": ln(f"{p}.cross_attn_ln"),
            "cross_attn": {
                "query": lin(f"{p}.cross_attn.query"),
                "key": lin(f"{p}.cross_attn.key", has_bias=False),
                "value": lin(f"{p}.cross_attn.value"),
                "out": lin(f"{p}.cross_attn.out"),
            },
            "mlp_ln": ln(f"{p}.mlp_ln"),
            "mlp_0": lin(f"{p}.mlp.0"),
            "mlp_2": lin(f"{p}.mlp.2"),
        }
    return {"params": params}
