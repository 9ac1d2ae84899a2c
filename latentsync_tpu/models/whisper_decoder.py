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


def greedy_decode(
    decoder: WhisperTextDecoder,
    params,
    audio_features: jnp.ndarray,
    sot_sequence: Sequence[int],
    rules: GreedyRules,
    sample_len: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy transcription of (B, Ta, C) audio features.

    Returns (tokens (B, L) int32 including the SOT prompt, with eot
    padding, avg_logprob (B,)). The whole loop — prompt prefill included
    — is one lax.while_loop under jit."""
    cfg = decoder.config
    b = audio_features.shape[0]
    n_ctx = cfg.n_text_ctx
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

        lp = jax.nn.log_softmax(logits, axis=-1)
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
