"""Packed-sequence geometry for MiniMax-H3 (host-side, numpy).

Parity target: ``extensions_built_in/diffusion_models/minimax_h3/src/
packing.py`` — one transformer forward runs over a single packed 1-D
sequence ``[text | keyframe conditions | target audio | target video]``.
This module owns row placement, the (t, h, w) rotary coordinates (float64,
numpy linspace — video and audio share one 40-units-per-second rotary clock:
video advances 5/3 units per pixel frame at 24 fps via the (1,4,4,4,4)
frames-per-latent pattern, audio one unit per latent at 40/s), and the
sigma-shift coupling (video shift 12, audio shift 3, exponential).

Everything here is static per (text_len, frames, resolution) bucket, so it
runs host-side once per bucket and feeds jit as constants.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

VIDEO_TAG = 0
TEXT_TAG = 1
AUDIO_TAG = 2
PAD_TAG = -1

FPS = 24
FRAMES_PER_CHUNK = 17
LATENTS_PER_CHUNK = 5
AUDIO_LATENTS_PER_SECOND = 40
AUDIO_CHANNELS = 2
AUDIO_SAMPLE_RATE = 32000
VIDEO_SIGMA_SHIFT = 12.0
AUDIO_SIGMA_SHIFT = 3.0
KEYFRAME_NOISE_AUG_T = 0.999

_ROPE_FRAME_RESCALE = 5.0 / 3.0
_ROPE_FRAMES_PER_LATENT = (1, 4, 4, 4, 4)
_ROPE_SPATIAL_SCALE = 32


def align_num_frames(num_frames: int) -> int:
    """Snap a frame count UP to the next 17n+5 the video VAE can encode."""
    if num_frames < 1:
        raise ValueError(f"num_frames must be positive, got {num_frames}")
    while num_frames % FRAMES_PER_CHUNK != LATENTS_PER_CHUNK:
        num_frames += 1
    return num_frames


def align_num_frames_down(num_frames: int) -> int:
    num_frames = max(num_frames, LATENTS_PER_CHUNK)
    while num_frames % FRAMES_PER_CHUNK != LATENTS_PER_CHUNK:
        num_frames -= 1
    return num_frames


def video_latent_num_frames(num_frames: int) -> int:
    """17n+5 pixel frames -> 5n+2 latent frames."""
    if num_frames % FRAMES_PER_CHUNK != LATENTS_PER_CHUNK:
        raise ValueError(f"num_frames must be of the form 17n+5, got {num_frames}")
    return (num_frames - LATENTS_PER_CHUNK) // FRAMES_PER_CHUNK * LATENTS_PER_CHUNK + 2


def audio_latent_num_frames(num_frames: int) -> int:
    return int(round(num_frames / FPS * AUDIO_LATENTS_PER_SECOND))


def patchify_video_latents(latents, patch_size=(1, 2, 2)):
    """[B, T, H, W, C] (NTHWC) -> [B, N, C*prod(patch)] rows, frame-major then
    row-major, feature order [c, pt, ph, pw] (packing.py patchify)."""
    import jax.numpy as jnp

    pt, ph, pw = patch_size
    b, t, h, w, c = latents.shape
    x = latents.reshape(b, t // pt, pt, h // ph, ph, w // pw, pw, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # b, t', h', w', c, pt, ph, pw
    return x.reshape(b, -1, c * pt * ph * pw)


def unpatchify_video_tokens(rows, t_lat: int, h_lat: int, w_lat: int,
                            channels: int = 24, patch_size=(1, 2, 2)):
    """[B, N, C*prod(patch)] -> [B, T, H, W, C]."""
    pt, ph, pw = patch_size
    b = rows.shape[0]
    x = rows.reshape(b, t_lat // pt, h_lat // ph, w_lat // pw,
                     channels, pt, ph, pw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t_lat, h_lat, w_lat, channels)


def pack_audio_latents(latents):
    """[B, 2, C, T] stereo audio latents -> [B, 2*T, C] channel-major rows."""
    b, ch, c, t = latents.shape
    return latents.transpose(0, 1, 3, 2).reshape(b, ch * t, c)


def unpack_audio_tokens(rows, num_audio_latents: int):
    """[B, 2*T, C] -> [B, 2, C, T]."""
    b, _, c = rows.shape
    x = rows.reshape(b, AUDIO_CHANNELS, num_audio_latents, c)
    return x.transpose(0, 1, 3, 2)


def _spatial_position_grid(dim: int, patch: int, sqrt_area: float) -> np.ndarray:
    ratio = dim / sqrt_area
    left = (1.0 - ratio) / 2.0
    return (np.linspace(left, left + ratio, dim // patch, endpoint=False)
            * _ROPE_SPATIAL_SCALE).astype(np.float64)


def _temporal_position_grid(num_latent_frames: int, origin: float) -> np.ndarray:
    spans = np.asarray([
        _ROPE_FRAME_RESCALE
        * _ROPE_FRAMES_PER_LATENT[i % len(_ROPE_FRAMES_PER_LATENT)]
        for i in range(num_latent_frames)
    ], dtype=np.float64)
    return origin + np.concatenate([np.zeros(1), np.cumsum(spans[:-1])])


def _temporal_position_span(num_latent_frames: int) -> float:
    spans = np.ones(num_latent_frames, dtype=np.float64) * _ROPE_FRAME_RESCALE
    for i in range(len(_ROPE_FRAMES_PER_LATENT)):
        spans[i::len(_ROPE_FRAMES_PER_LATENT)] *= _ROPE_FRAMES_PER_LATENT[i]
    return float(spans.sum())


@dataclass
class PackedLayout:
    sequence_length: int
    position_ids: np.ndarray       # (S, 3) float64
    token_tags: np.ndarray         # (S,) int64
    video_indices: np.ndarray      # condition rows first, then target rows
    audio_indices: np.ndarray
    text_indices: np.ndarray
    num_condition_video_rows: int


def build_packed_sequence(
    text_token_tags: np.ndarray,  # (L,) int: 1 text, 0 for vision-block rows
    num_latent_frames: int,
    latent_height: int,
    latent_width: int,
    num_audio_latents: int,
    patch_size=(1, 2, 2),
    keyframe_anchors: tuple[str, ...] = (),
) -> PackedLayout:
    """[text | keyframe conditions | target audio | target video] layout
    (packing.py build_packed_sequence, numpy transcription)."""
    _, ph, pw = patch_size
    rows_per_frame = (latent_height // ph) * (latent_width // pw)
    num_text = int(text_token_tags.shape[0])
    num_cond = len(keyframe_anchors) * rows_per_frame
    num_audio_rows = num_audio_latents * AUDIO_CHANNELS
    num_video_rows = num_latent_frames * rows_per_frame
    seq_len = num_text + num_cond + num_audio_rows + num_video_rows

    cond_start = num_text
    audio_start = cond_start + num_cond
    video_start = audio_start + num_audio_rows

    position_ids = np.zeros((seq_len, 3), dtype=np.float64)
    position_ids[:num_text, 0] = np.arange(num_text, dtype=np.float64)

    sqrt_area = math.sqrt(latent_height * latent_width)
    height_grid = _spatial_position_grid(latent_height, ph, sqrt_area)
    width_grid = _spatial_position_grid(latent_width, pw, sqrt_area)
    hh, ww = np.meshgrid(height_grid, width_grid, indexing="ij")
    frame_grid = np.stack([hh.reshape(-1), ww.reshape(-1)], axis=-1)

    for i, anchor in enumerate(keyframe_anchors):
        if anchor == "first":
            anchor_time = float(num_text)
        elif anchor == "last":
            anchor_time = (float(num_text)
                           + _temporal_position_span(num_latent_frames)
                           - _ROPE_FRAME_RESCALE)
        else:
            raise ValueError(
                f"keyframe anchor must be 'first' or 'last', got {anchor!r}")
        rows = slice(cond_start + i * rows_per_frame,
                     cond_start + (i + 1) * rows_per_frame)
        position_ids[rows, 0] = anchor_time
        position_ids[rows, 1:] = frame_grid

    audio_time = float(num_text) + np.arange(num_audio_latents, dtype=np.float64)
    position_ids[audio_start:video_start, 0] = np.tile(audio_time, AUDIO_CHANNELS)
    position_ids[audio_start:video_start, 2] = np.concatenate([
        np.full(num_audio_latents, float(width_grid[0])),
        np.full(num_audio_latents, float(width_grid[-1])),
    ])

    video_pos = np.empty((num_latent_frames, rows_per_frame, 3), dtype=np.float64)
    video_pos[:, :, 0] = _temporal_position_grid(
        num_latent_frames, float(num_text))[:, None]
    video_pos[:, :, 1:] = frame_grid[None]
    position_ids[video_start:] = video_pos.reshape(-1, 3)

    video_indices = np.concatenate([
        np.arange(cond_start, audio_start), np.arange(video_start, seq_len)])
    audio_indices = np.arange(audio_start, video_start)
    text_indices = np.arange(num_text)

    token_tags = np.empty(seq_len, dtype=np.int64)
    token_tags[text_indices] = np.asarray(text_token_tags, np.int64)
    token_tags[audio_indices] = AUDIO_TAG
    token_tags[video_indices] = VIDEO_TAG

    return PackedLayout(
        sequence_length=seq_len,
        position_ids=position_ids,
        token_tags=token_tags,
        video_indices=video_indices,
        audio_indices=audio_indices,
        text_indices=text_indices,
        num_condition_video_rows=num_cond,
    )


def pad_layouts_to_batch(layouts: list[PackedLayout]):
    """Right-pad the TEXT segment to the batch max (pad rows tagged -1,
    positions zero). Returns (position_ids (B,S,3) f64, token_tags (B,S),
    video_indices, audio_indices, text_indices, pad_counts)."""
    max_text = max(int(l.text_indices.shape[0]) for l in layouts)
    ref = layouts[0]
    media_len = ref.sequence_length - int(ref.text_indices.shape[0])
    for l in layouts:
        if l.sequence_length - int(l.text_indices.shape[0]) != media_len:
            raise ValueError("all layouts in a batch must share media geometry")
    seq_len = max_text + media_len

    b = len(layouts)
    position_ids = np.zeros((b, seq_len, 3), dtype=np.float64)
    token_tags = np.full((b, seq_len), PAD_TAG, dtype=np.int64)
    pad_counts = []
    for i, l in enumerate(layouts):
        lt = int(l.text_indices.shape[0])
        position_ids[i, :lt] = l.position_ids[:lt]
        position_ids[i, max_text:] = l.position_ids[lt:]
        token_tags[i, :lt] = l.token_tags[:lt]
        token_tags[i, max_text:] = l.token_tags[lt:]
        pad_counts.append(max_text - lt)

    offset = max_text - int(ref.text_indices.shape[0])
    video_indices = ref.video_indices + offset
    audio_indices = ref.audio_indices + offset
    text_indices = np.arange(max_text)
    return (position_ids, token_tags, video_indices, audio_indices,
            text_indices, pad_counts)


def shift_sigma(sigma, shift: float):
    """Exponential timeshift: shift * sigma / (1 + (shift - 1) * sigma)."""
    return shift * sigma / (1.0 + (shift - 1.0) * sigma)


def remap_sigma(sigma, from_shift: float = VIDEO_SIGMA_SHIFT,
                to_shift: float = AUDIO_SIGMA_SHIFT):
    """Map a sigma from one exponential-shift schedule onto another at the
    same underlying position (the video/audio coupling)."""
    base = sigma / (from_shift + sigma * (1.0 - from_shift))
    return shift_sigma(base, to_shift)


def build_sigma_schedule(num_inference_steps: int,
                         shift: float = VIDEO_SIGMA_SHIFT) -> np.ndarray:
    """linspace(1, 0, steps+1) through the exponential shift, consecutive
    duplicates collapsed."""
    base = np.linspace(1.0, 0.0, num_inference_steps + 1, dtype=np.float32)
    sigmas = shift_sigma(base, shift)
    keep = np.concatenate([[True], np.diff(sigmas) != 0])
    return sigmas[keep]
