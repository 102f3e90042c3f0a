"""Log-mel spectrogram frontend (Whisper-compatible).

Two implementations with identical numerics:

- ``log_mel_spectrogram_np`` — host-side numpy, bit-exact parity with HF's
  ``WhisperFeatureExtractor`` (the reference consumes it via
  ultravox_processing.py:295-303). Used by the processor on the data path.
- ``log_mel_spectrogram`` — JAX, expressed as two matmuls (windowed-DFT as a
  matrix product, then the mel filter bank) so the whole frontend runs on the
  MXU under jit; this is the on-device path used for serving TTFT and the
  basis for the fused Pallas kernel.

Whisper constants: n_fft=400, hop=160, 16 kHz, periodic Hann, reflect-centre
padding, power-2 spectrogram, slaney mel scale + slaney norm, log10 with 1e-10
floor, per-sample dynamic-range compression ``max(x, x.max()-8)``, then
``(x+4)/4``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80  # whisper-large-v3* uses 128


def hertz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    return np.where(
        freq >= min_log_hertz,
        min_log_mel + np.log(np.maximum(freq, 1e-12) / min_log_hertz) * logstep,
        mels,
    )


def mel_to_hertz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(
        mels >= min_log_mel,
        min_log_hertz * np.exp(logstep * (mels - min_log_mel)),
        freq,
    )


@functools.lru_cache(maxsize=8)
def mel_filter_bank(
    num_frequency_bins: int = N_FFT // 2 + 1,
    num_mel_filters: int = N_MELS,
    min_frequency: float = 0.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Slaney-scale, slaney-normalised triangular mel filter bank
    (num_frequency_bins, num_mel_filters), float64 computed, float32 returned.
    """
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)
    mel_min = hertz_to_mel_slaney(min_frequency)
    mel_max = hertz_to_mel_slaney(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = mel_to_hertz_slaney(mel_freqs)

    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[np.newaxis, :] - fft_freqs[:, np.newaxis]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
    fb = fb * enorm[np.newaxis, :]
    return fb.astype(np.float32)


def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann window (matches HF ``window_function(n, "hann")``)."""
    return np.hanning(n + 1)[:-1].astype(np.float64)


def log_mel_spectrogram_np(
    waveform: np.ndarray,
    num_mel_filters: int = N_MELS,
) -> np.ndarray:
    """Single-sample log-mel features, shape (num_mel_filters, num_frames)
    where num_frames = len(waveform) // HOP_LENGTH (the final STFT frame is
    dropped, matching WhisperFeatureExtractor._np_extract_fbank_features).
    """
    waveform = np.asarray(waveform, dtype=np.float64)
    window = hann_window(N_FFT)
    half = N_FFT // 2
    padded = np.pad(waveform, (half, half), mode="reflect")
    num_frames = 1 + (len(padded) - N_FFT) // HOP_LENGTH

    idx = (
        np.arange(num_frames)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    )
    frames = padded[idx] * window[None, :]
    stft = np.fft.rfft(frames, axis=-1)  # (num_frames, n_fft//2+1)
    power = np.abs(stft) ** 2

    fb = mel_filter_bank(num_mel_filters=num_mel_filters).astype(np.float64)
    mel = power @ fb  # (num_frames, n_mels)
    log_spec = np.log10(np.maximum(mel, 1e-10)).T  # (n_mels, num_frames)
    log_spec = log_spec[:, :-1]  # drop the final frame
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_matrices(num_mel_filters: int):
    """Precompute (window ⊙ DFT) real/imag matrices and the mel bank as a
    single pair of matmul operands: frames @ W_re / W_im -> rfft parts."""
    n_bins = N_FFT // 2 + 1
    window = hann_window(N_FFT)
    k = np.arange(n_bins)
    n = np.arange(N_FFT)
    angle = -2.0 * np.pi * np.outer(n, k) / N_FFT  # (N_FFT, n_bins)
    w_re = (window[:, None] * np.cos(angle)).astype(np.float32)
    w_im = (window[:, None] * np.sin(angle)).astype(np.float32)
    fb = mel_filter_bank(num_mel_filters=num_mel_filters)
    return w_re, w_im, fb


@functools.lru_cache(maxsize=8)
def _dft_block_matrices(num_mel_filters: int):
    """The windowed-DFT matrices of ``_dft_matrices`` split into
    HOP_LENGTH-row blocks, zero-padded to a whole number of blocks.

    STFT frame t covers samples [t*HOP, t*HOP + N_FFT): with the operands in
    hop-sized blocks, frame t is spanned by blocks t .. t+n_blocks-1, so
    ``rfft_re = Σ_j blocks[:, t+j] @ w_re_blk[j]`` — three shifted matmuls
    instead of materialising the (B, T, N_FFT) frame tensor through a gather
    (which dominates the frontend cost on TPU: ~8 ms of the ~9 ms batch-8
    30 s mel at 38 MB of gather traffic)."""
    w_re, w_im, fb = _dft_matrices(num_mel_filters)
    n_blocks = -(-N_FFT // HOP_LENGTH)  # ceil: 400/160 -> 3
    pad = n_blocks * HOP_LENGTH - N_FFT
    w_re = np.pad(w_re, ((0, pad), (0, 0)))
    w_im = np.pad(w_im, ((0, pad), (0, 0)))
    re_blocks = w_re.reshape(n_blocks, HOP_LENGTH, -1)
    im_blocks = w_im.reshape(n_blocks, HOP_LENGTH, -1)
    return re_blocks, im_blocks, fb


@functools.partial(
    jax.jit, static_argnames=("num_mel_filters", "num_frames", "use_fft")
)
def log_mel_spectrogram(
    waveforms: jax.Array,  # (B, n_samples) float32
    num_mel_filters: int = N_MELS,
    num_frames: int | None = None,
    use_fft: bool = False,
) -> jax.Array:
    """Batched on-device log-mel features, shape (B, n_mels, num_frames).

    num_frames defaults to n_samples // HOP_LENGTH.

    ``use_fft=True`` computes the STFT with ``jnp.fft.rfft`` — fp32 accurate
    to ~1e-6 vs the fp64 host path, but XLA's TPU FFT is slow (~10 ms for
    batch 8 x 30 s). ``use_fft=False`` (default) expresses the DFT as two
    matmuls against precomputed windowed-DFT matrices — pure MXU work, ~10x
    faster. The dots are pinned to ``Precision.HIGHEST`` (6-pass bf16
    decomposition on TPU ≈ fp32 accumulation): at default (single-pass bf16)
    precision the low-energy bins suffer cancellation (observed ~0.4 max abs
    error in log-mel space); at HIGHEST both paths agree with the fp64 host
    reference to ~3e-5.
    """
    B, n_samples = waveforms.shape
    if num_frames is None:
        num_frames = n_samples // HOP_LENGTH

    half = N_FFT // 2
    padded = jnp.pad(waveforms, ((0, 0), (half, half)), mode="reflect")

    if use_fft:
        idx = (
            jnp.arange(num_frames)[:, None] * HOP_LENGTH
            + jnp.arange(N_FFT)[None, :]
        )
        frames = padded[:, idx]  # (B, num_frames, N_FFT)
        window = jnp.asarray(hann_window().astype(np.float32))
        stft = jnp.fft.rfft(frames * window[None, None, :], axis=-1)
        power = jnp.real(stft) ** 2 + jnp.imag(stft) ** 2
        fb = jnp.asarray(mel_filter_bank(num_mel_filters=num_mel_filters))
    else:
        re_blk, im_blk, fb = (
            jnp.asarray(m) for m in _dft_block_matrices(num_mel_filters)
        )
        n_blocks = re_blk.shape[0]
        # pad so every frame's last block exists, reshape into hop blocks
        total = (num_frames + n_blocks - 1) * HOP_LENGTH
        padded = jnp.pad(padded, ((0, 0), (0, max(0, total - padded.shape[1]))))
        blocks = padded[:, :total].reshape(B, -1, HOP_LENGTH)
        hi = jax.lax.Precision.HIGHEST
        re = jnp.zeros((B, num_frames, re_blk.shape[-1]), jnp.float32)
        im = jnp.zeros((B, num_frames, re_blk.shape[-1]), jnp.float32)
        for j in range(n_blocks):
            xj = jax.lax.dynamic_slice_in_dim(blocks, j, num_frames, axis=1)
            re = re + jnp.einsum("btn,nk->btk", xj, re_blk[j], precision=hi)
            im = im + jnp.einsum("btn,nk->btk", xj, im_blk[j], precision=hi)
        power = re * re + im * im

    mel = jnp.einsum(
        "btk,km->btm", power, fb, precision=jax.lax.Precision.HIGHEST
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))  # (B, T, M)
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.transpose(log_spec, (0, 2, 1))  # (B, M, T)
