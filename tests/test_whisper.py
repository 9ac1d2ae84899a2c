"""Whisper encoder parity vs HuggingFace transformers' WhisperEncoder
(independent torch implementation of the same architecture), plus the
Audio2Feature slicing index math."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from latentsync_tpu.audio.features import Audio2Feature
from latentsync_tpu.config import WhisperConfig
from latentsync_tpu.models.whisper import WhisperEncoder


def tiny_cfg(ctx=1500):
    return WhisperConfig(n_mels=80, n_audio_ctx=ctx, n_audio_state=384,
                         n_audio_head=6, n_audio_layer=4)


@pytest.fixture(scope="module")
def hf_encoder():
    from transformers import WhisperConfig as HFConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder as HFEncoder

    cfg = HFConfig(
        num_mel_bins=80,
        d_model=384,
        encoder_layers=4,
        encoder_attention_heads=6,
        encoder_ffn_dim=1536,
        max_source_positions=1500,
        activation_function="gelu",
    )
    torch.manual_seed(0)
    enc = HFEncoder(cfg).eval()
    return enc


def convert_hf_params(enc, ctx=1500):
    """Map HF WhisperEncoder weights onto our flax param tree."""
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}

    def conv_w(w):  # torch (O, I, K) → flax (K, I, O)
        return np.transpose(w, (2, 1, 0))

    def lin_w(w):  # torch (O, I) → flax (I, O)
        return w.T

    params = {
        "conv1": {"kernel": conv_w(sd["conv1.weight"]), "bias": sd["conv1.bias"]},
        "conv2": {"kernel": conv_w(sd["conv2.weight"]), "bias": sd["conv2.bias"]},
        "ln_post": {"scale": sd["layer_norm.weight"], "bias": sd["layer_norm.bias"]},
    }
    for i in range(4):
        p = f"layers.{i}."
        params[f"blocks_{i}"] = {
            "attn_ln": {
                "scale": sd[p + "self_attn_layer_norm.weight"],
                "bias": sd[p + "self_attn_layer_norm.bias"],
            },
            "attn": {
                "query": {"kernel": lin_w(sd[p + "self_attn.q_proj.weight"]),
                          "bias": sd[p + "self_attn.q_proj.bias"]},
                "key": {"kernel": lin_w(sd[p + "self_attn.k_proj.weight"])},
                "value": {"kernel": lin_w(sd[p + "self_attn.v_proj.weight"]),
                          "bias": sd[p + "self_attn.v_proj.bias"]},
                "out": {"kernel": lin_w(sd[p + "self_attn.out_proj.weight"]),
                        "bias": sd[p + "self_attn.out_proj.bias"]},
            },
            "mlp_ln": {"scale": sd[p + "final_layer_norm.weight"],
                       "bias": sd[p + "final_layer_norm.bias"]},
            "mlp_0": {"kernel": lin_w(sd[p + "fc1.weight"]), "bias": sd[p + "fc1.bias"]},
            "mlp_2": {"kernel": lin_w(sd[p + "fc2.weight"]), "bias": sd[p + "fc2.bias"]},
        }
    return {"params": jax.tree.map(jnp.asarray, params)}


def test_encoder_matches_hf(rng, hf_encoder):
    """Same random weights → same encoder output (both stacks use sinusoidal
    positions; HF uses the identical whisper sinusoid table)."""
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf_encoder(torch.from_numpy(mel)).last_hidden_state.numpy()

    model = WhisperEncoder(tiny_cfg())
    params = convert_hf_params(hf_encoder)
    out = model.apply(params, jnp.asarray(mel), include_embeddings=False)
    assert out.shape == ref.shape == (1, 1500, 384)
    out = np.asarray(out)
    # f32 accumulation-order noise dominates with untrained random weights
    # (f64 parity is ~1e-5 relative); require tight correlation + loose abs
    np.testing.assert_allclose(out, ref, atol=5e-2, rtol=5e-2)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99999, corr


def test_embedding_stack_shape(rng):
    model = WhisperEncoder(tiny_cfg())
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mel)
    final, stack = model.apply(params, mel, include_embeddings=True)
    assert final.shape == (2, 1500, 384)
    assert stack.shape == (2, 5, 1500, 384)  # n_layer+1 embeddings


def test_slice_indices_match_reference_loop():
    """Mirror ref:audio2feature.py:24-49 index arithmetic."""
    a2f = Audio2Feature.__new__(Audio2Feature)
    a2f.audio_feat_length = (2, 2)
    a2f.embedding_dim = 384
    length = 200
    for fps in (25, 30, 24):
        for vid_idx in (0, 1, 7, 50, 99):
            center = int(vid_idx * 50 / fps)
            expected = [
                min(max(i, 0), length - 1)
                for i in range(center - 4, center + 6)
            ]
            got = a2f.slice_indices(vid_idx, length, fps).tolist()
            assert got == expected, (fps, vid_idx)


def test_feature2chunks_count_and_shape(rng):
    a2f = Audio2Feature.__new__(Audio2Feature)
    a2f.audio_feat_length = (2, 2)
    a2f.embedding_dim = 384
    a2f.num_frames = 16
    feats = rng.standard_normal((100, 5, 384)).astype(np.float32)
    chunks = a2f.feature2chunks(feats, fps=25)
    # reference loop: appends while int(i*2) <= 100 → i = 0..50 inclusive
    assert chunks.shape == (51, 50, 384)
    # chunk 3 covers indices [2,12) (center=6)
    np.testing.assert_array_equal(
        chunks[3], feats[2:12].reshape(50, 384)
    )


def test_whisper_small_config_builds_and_selects():
    """whisper-small (768-dim) support: selected by
    cross_attention_dim==768 (ref:scripts/inference.py:42-47) and the
    encoder builds/runs at the small dims."""
    import jax

    from latentsync_tpu.config import WhisperConfig
    from latentsync_tpu.models.whisper import WhisperEncoder

    small = WhisperConfig.small()
    assert (small.n_audio_state, small.n_audio_head, small.n_audio_layer) == (768, 12, 12)

    # reduced-depth variant at the small width (full 12 layers is slow on CPU)
    cfg = WhisperConfig(n_audio_state=768, n_audio_head=12, n_audio_layer=2)
    enc = WhisperEncoder(cfg)
    mel = jnp.zeros((1, 80, 3000))
    params = enc.init(jax.random.PRNGKey(0), mel)
    out = enc.apply(params, mel, include_embeddings=True)
    embeds = out[1] if isinstance(out, tuple) else out
    # per-layer embeddings stacked: (layers+1?, B, T, 768) or similar —
    # just require the hidden width to be 768 and values finite
    assert 768 in np.asarray(embeds).shape
    assert np.isfinite(np.asarray(embeds)).all()
