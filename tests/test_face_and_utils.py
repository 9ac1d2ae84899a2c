"""Face geometry, repeat utilities, image processor, loss tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from latentsync_tpu.training.losses import cosine_bce_loss, mixed_noise
from latentsync_tpu.utils import repeat as lrepeat
from latentsync_tpu.utils.face import (
    AlignRestore,
    LandmarkSmoother,
    similarity_from_points,
    warp_affine_batch,
)
from latentsync_tpu.utils.image_processor import ImageProcessor, load_fixed_mask


def test_similarity_transform_recovers_known_motion(rng):
    """Known rotation+scale+translation must be recovered exactly."""
    theta, s = 0.3, 1.7
    t = np.array([5.0, -3.0])
    r = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    src = rng.standard_normal((3, 2)) * 10
    dst = (s * (r @ src.T)).T + t
    m, _ = similarity_from_points(src, dst, smooth=False)
    mapped = (m[:, :2] @ src.T).T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-8)


def test_similarity_bias_smoothing():
    """smooth=True nudges translation by EMA of the STANDARDIZED
    3rd-point residual (ref:affine_transform.py:10-31) — the bias must be
    sub-pixel scale even when src/dst are hundreds of pixels apart."""
    src = np.array([[0.0, 0], [10, 0], [5, 5]])
    dst = src * 3 + 500.0  # large raw offset
    m1, bias1 = similarity_from_points(src, dst, smooth=True, prev_bias=None)
    assert bias1 is not None
    # standardized residual, NOT the ~500px raw offset
    assert np.abs(bias1).max() < 1.0
    m2, bias2 = similarity_from_points(src, dst, smooth=True, prev_bias=bias1 + 1.0)
    np.testing.assert_allclose(bias2, (bias1 + 1.0) * 0.2 + bias1 * 0.8)
    # the warp must still land points on dst (bias is a small perturbation)
    mapped = (m1[:, :2] @ src.T).T + m1[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1.5)


def test_landmark_smoother_first_call_identity():
    sm = LandmarkSmoother()
    pts = np.array([[1.0, 2.0], [3.0, 4.0], [10.0, 2.0]])
    out = sm(pts)
    np.testing.assert_array_equal(out, pts)
    # tiny motion is heavily damped toward previous
    out2 = sm(pts + 0.01)
    assert np.abs(out2 - pts).max() < 0.01


def test_align_restore_roundtrip(rng):
    """Warp a frame to the face crop and paste it back unchanged → the
    face region must survive the roundtrip."""
    frame = (rng.random((200, 200, 3)) * 255).astype(np.uint8)
    ar = AlignRestore()
    anchors = np.array([[70.0, 60.0], [130.0, 60.0], [100.0, 100.0]])
    face, m = ar.align_warp_face(frame, anchors, smooth=False)
    assert face.shape == (ar.face_size[1], ar.face_size[0], 3)
    restored = ar.restore_img(frame, face, m)
    assert restored.shape == frame.shape
    # center of the pasted face region should be close to the original
    diff = np.abs(restored[80:120, 80:120].astype(int) - frame[80:120, 80:120].astype(int))
    assert diff.mean() < 12.0


def test_warp_affine_batch_identity(rng):
    imgs = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    eye = jnp.asarray(np.tile(np.array([[1.0, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1)))
    out = warp_affine_batch(imgs, eye, (16, 16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_warp_affine_batch_translation(rng):
    img = np.zeros((1, 8, 8, 1), np.float32)
    img[0, 2, 3, 0] = 1.0
    m = np.array([[[1.0, 0, 2.0], [0, 1, 1.0]]], np.float32)  # shift x+2, y+1
    out = np.asarray(warp_affine_batch(jnp.asarray(img), jnp.asarray(m), (8, 8), fill=0.0))
    assert out[0, 3, 5, 0] == pytest.approx(1.0, abs=1e-5)


def test_repeat_truncate_semantics():
    a = np.arange(10)
    assert len(lrepeat.repeat_to_length(a, 25)) == 25
    np.testing.assert_array_equal(lrepeat.repeat_to_length(a, 25)[:10], a)
    # truncate drops from the FRONT (ref:repeat.py:33-56)
    np.testing.assert_array_equal(lrepeat.truncate_to_length(a, 4), [6, 7, 8, 9])


def test_pad_chunks_end():
    chunks = np.ones((20, 50, 8), np.float32)
    audio = np.ones(int(20 / 25 * 16000), np.float32)
    out, audio_out, pad_sec = lrepeat.pad_chunks_end(chunks, audio, 16000, fps=25)
    assert len(out) == 32 and pad_sec == pytest.approx(12 / 25)
    # appended chunks are zeros; audio padded at the end
    assert out[20:].sum() == 0
    assert len(audio_out) == len(audio) + int(pad_sec * 16000)
    assert audio_out[-10:].sum() == 0


def test_image_processor_mask_polarity(rng):
    proc = ImageProcessor(64, mask="fix_mask")
    faces = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
    pix, masked, masks = proc.prepare_masks_and_masked_images(faces)
    assert pix.shape == (3, 64, 64, 3) and masks.shape == (3, 64, 64, 1)
    assert pix.min() >= -1.0 and pix.max() <= 1.0
    # mouth region (mask==0) must be zeroed in masked image; the real
    # mask.png resized by LANCZOS has soft boundary pixels, so test the
    # strict-zero interior and the strict-one exterior
    zero_region = masks[0, :, :, 0] == 0.0
    assert zero_region.any()
    assert np.abs(masked[0][zero_region]).max() < 1e-6
    # keep region unchanged
    keep = masks[0, :, :, 0] >= 1.0
    assert keep.any()
    np.testing.assert_allclose(masked[0][keep], pix[0][keep], atol=1e-6)


def test_cosine_bce_loss_limits():
    v = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    a = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])  # sim 1, sim 0
    y = jnp.asarray([1.0, 0.0])
    losses = np.asarray(cosine_bce_loss(v, a, y))
    assert losses[0] < 1e-5          # perfectly aligned positive
    assert losses[1] < 1e-5 + 1e-6   # orthogonal negative → -log(1-0)=0
    y_wrong = jnp.asarray([0.0, 1.0])
    losses_w = np.asarray(cosine_bce_loss(v, a, y_wrong))
    assert (losses_w > 5).all()


def test_cosine_bce_loss_bf16_embeddings_keep_gradient():
    """Near-collapsed bf16 embeddings must not saturate the similarity
    to exactly 1.0 (the clip's zero gradient would freeze training —
    r4 regression): the dot is accumulated in f32."""
    import jax

    # two nearly identical bf16 unit vectors: bf16 dot rounds to 1.0,
    # f32 dot stays strictly below
    v = jnp.asarray([[0.7071, 0.7071, 0.0, 0.0]], jnp.bfloat16)
    a = jnp.asarray([[0.7070, 0.7072, 0.004, 0.0]], jnp.bfloat16)
    y = jnp.asarray([0.0])

    def mean_loss(vv):
        return jnp.mean(cosine_bce_loss(vv, a, y))

    g = np.asarray(jax.grad(mean_loss)(v).astype(jnp.float32))
    assert np.abs(g).max() > 0.0, "gradient died on a y=0 near-collapse"
    loss = float(np.asarray(mean_loss(v)))
    assert loss > 1.0  # wrong-label high-sim pair is strongly penalized


def test_mixed_noise_statistics():
    import jax

    noise = mixed_noise(jax.random.PRNGKey(0), (4, 16, 8, 8, 4), alpha=1.0)
    n = np.asarray(noise)
    assert abs(n.std() - 1.0) < 0.05  # variance-normalized
    # frames within a sample are correlated through the shared component
    flat = n.reshape(4, 16, -1)
    corr = np.corrcoef(flat[0, 0], flat[0, 1])[0, 1]
    assert corr > 0.3


def test_fixed_mask_matches_reference_asset(reference_dir):
    """The vendored mouth-mask asset must be bit-identical to the
    reference's latentsync/utils/mask.png at 256² — it defines which
    pixels the UNet regenerates AND is a conditioning channel
    (ref:image_processor.py:31-36)."""
    import cv2

    mask = load_fixed_mask(256)
    ref = cv2.cvtColor(
        cv2.imread(f"{reference_dir}/latentsync/utils/mask.png"), cv2.COLOR_BGR2RGB
    ).astype(np.float32) / 255.0
    assert np.array_equal(mask, ref)
    # sanity: binary, ~40% of the crop is the regenerate region
    assert set(np.unique(mask)) == {0.0, 1.0}
    assert 0.3 < (mask[..., 0] == 0).mean() < 0.5


def test_repeat_tail_helpers(tmp_path, rng):
    """add_start_silence / duplicate_first_frames / process_video_with_trim
    (ref:repeat.py:260-368): serving prepends a silent 16-frame lead-in
    that the trim step later removes, keeping A/V in sync."""
    import cv2

    from latentsync_tpu.utils.media import read_audio, read_video, write_audio

    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    padded = lrepeat.add_start_silence(audio, 16000, silence_duration=1)
    assert len(padded) == 32000 and np.abs(padded[:16000]).max() == 0

    frames = (rng.random((40, 32, 32, 3)) * 255).astype(np.uint8)
    dup = lrepeat.duplicate_first_frames(frames, 16)
    assert len(dup) == 56
    np.testing.assert_array_equal(dup[:16], frames[:16])

    # video with a distinctive first-16-frame lead-in
    temp = tmp_path / "temp"
    temp.mkdir()
    lead = np.zeros((16, 32, 32, 3), np.uint8)
    body = np.full((24, 32, 32, 3), 200, np.uint8)
    w = cv2.VideoWriter(str(temp / "video.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 25, (32, 32))
    for fr in np.concatenate([lead, body]):
        w.write(fr)
    w.release()
    write_audio(str(temp / "audio.wav"), np.ones(int(40 / 25 * 16000), np.float32) * 0.1)

    out = lrepeat.process_video_with_trim(str(temp), str(tmp_path / "out.mp4"),
                                          padding_duration=8 / 25)
    got = read_video(out, change_fps=False)
    # 40 - 16 lead-in - 8 padding = 16 frames, all from the bright body
    assert len(got) == 16
    assert got.mean() > 150
    wav = read_audio(str(tmp_path / "out.wav") if not
                     __import__("latentsync_tpu.utils.media", fromlist=["HAVE_FFMPEG"]).HAVE_FFMPEG
                     else out, 16000)
    assert abs(len(wav) - int(16 / 25 * 16000)) <= 640  # within 40ms


def test_streaming_video_writer_matches_bulk(tmp_path, rng):
    """StreamingVideoWriter (chunk-by-chunk, encoder on its own thread)
    must produce the same video as the one-shot write_video path the
    pipeline used before — decoded frames compare exactly since both
    feed identical RGB frames through identical codec settings."""
    from latentsync_tpu.utils.media import (
        StreamingVideoWriter,
        read_video,
        write_audio,
        write_video,
    )

    frames = (rng.random((23, 32, 32, 3)) * 255).astype(np.uint8)
    wav = tmp_path / "a.wav"
    write_audio(str(wav), np.ones(16000, np.float32) * 0.1)

    bulk = write_video(str(tmp_path / "bulk.mp4"), frames, fps=25,
                       audio_path=str(wav))

    writer = StreamingVideoWriter(str(tmp_path / "stream.mp4"), fps=25,
                                  frame_hw=(32, 32), audio_path=str(wav))
    for lo in range(0, len(frames), 7):  # uneven chunks incl. a short tail
        writer.append(frames[lo:lo + 7])
    streamed = writer.close()
    assert writer.busy_s > 0

    a = read_video(bulk, change_fps=False)
    b = read_video(streamed, change_fps=False)
    np.testing.assert_array_equal(a, b)
