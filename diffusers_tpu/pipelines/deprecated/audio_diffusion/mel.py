"""Mel spectrogram <-> audio conversion for AudioDiffusionPipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/audio_diffusion/mel.py:37`)
WITHOUT the librosa dependency (not in this image): the STFT, Slaney-scale
mel filter bank, dB conversion, and Griffin-Lim inversion are implemented
directly in numpy, matching librosa's default conventions (hann window,
centered reflect padding, power-2 magnitude, slaney normalization). The mel
inverse uses a clipped pseudo-inverse instead of librosa's NNLS — an
approximation adequate for the 8-bit spectrogram images this pipeline round
trips.
"""

from __future__ import annotations

import numpy as np

from ....configuration_utils import ConfigMixin, register_to_config


def _hann(n):
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def _hz_to_mel(f):
    f = np.asarray(f, np.float64)
    mel = f * 3.0 / 200.0
    return np.where(f >= 1000.0, 15.0 + 27.0 * np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4), mel)


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = m * 200.0 / 3.0
    return np.where(m >= 15.0, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)


def mel_filter_bank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax=None) -> np.ndarray:
    """[n_mels, 1 + n_fft//2] Slaney-normalized triangular filters (librosa
    `filters.mel` defaults)."""
    fmax = fmax or sr / 2
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    weights = np.zeros((n_mels, len(fft_freqs)))
    for m in range(n_mels):
        lower, center, upper = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        left = (fft_freqs - lower) / max(center - lower, 1e-10)
        right = (upper - fft_freqs) / max(upper - center, 1e-10)
        weights[m] = np.maximum(0, np.minimum(left, right))
        weights[m] *= 2.0 / (upper - lower)  # slaney area normalization
    return weights


def _stft(y: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    pad = n_fft // 2
    y = np.pad(y, pad, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    window = _hann(n_fft)
    frames = np.stack([y[i * hop: i * hop + n_fft] * window for i in range(n_frames)])
    return np.fft.rfft(frames, axis=1).T  # [1 + n_fft//2, n_frames]


def _istft(spec: np.ndarray, n_fft: int, hop: int, length: int) -> np.ndarray:
    window = _hann(n_fft)
    frames = np.fft.irfft(spec.T, n=n_fft, axis=1)
    out = np.zeros(n_fft + hop * (frames.shape[0] - 1))
    norm = np.zeros_like(out)
    for i, frame in enumerate(frames):
        out[i * hop: i * hop + n_fft] += frame * window
        norm[i * hop: i * hop + n_fft] += window**2
    out = out / np.maximum(norm, 1e-10)
    pad = n_fft // 2
    return out[pad: pad + length]


class Mel(ConfigMixin):
    config_name = "mel_config.json"

    @register_to_config
    def __init__(self, x_res: int = 256, y_res: int = 256, sample_rate: int = 22050,
                 n_fft: int = 2048, hop_length: int = 512, top_db: int = 80, n_iter: int = 32):
        self.hop_length = hop_length
        self.sr = sample_rate
        self.n_fft = n_fft
        self.top_db = top_db
        self.n_iter = n_iter
        self.set_resolution(x_res, y_res)
        self.audio = None

    def set_resolution(self, x_res: int, y_res: int):
        self.x_res = x_res
        self.y_res = y_res
        self.n_mels = y_res
        self.slice_size = self.x_res * self.hop_length - 1
        self._mel_fb = mel_filter_bank(self.sr, self.n_fft, self.n_mels)

    def load_audio(self, audio_file: str = None, raw_audio: np.ndarray = None):
        if audio_file is not None:
            raise ValueError("file loading requires librosa (unavailable); pass raw_audio")
        self.audio = np.asarray(raw_audio, np.float64)
        if len(self.audio) < self.x_res * self.hop_length:
            self.audio = np.concatenate(
                [self.audio, np.zeros(self.x_res * self.hop_length - len(self.audio))])

    def get_number_of_slices(self) -> int:
        return len(self.audio) // self.slice_size

    def get_audio_slice(self, slice: int = 0) -> np.ndarray:
        return self.audio[self.slice_size * slice: self.slice_size * (slice + 1)]

    def get_sample_rate(self) -> int:
        return self.sr

    def audio_slice_to_image(self, slice: int):
        """Audio slice → x_res × y_res grayscale spectrogram (reference `:141`)."""
        from PIL import Image

        spec = np.abs(_stft(self.get_audio_slice(slice), self.n_fft, self.hop_length)) ** 2
        S = self._mel_fb @ spec  # [n_mels, frames]
        # librosa power_to_db(ref=np.max, top_db)
        log_S = 10.0 * np.log10(np.maximum(S, 1e-10))
        log_S -= 10.0 * np.log10(max(S.max(), 1e-10))
        log_S = np.maximum(log_S, -self.top_db)
        bytedata = (((log_S + self.top_db) * 255 / self.top_db).clip(0, 255) + 0.5).astype(np.uint8)
        return Image.fromarray(bytedata)

    def image_to_audio(self, image) -> np.ndarray:
        """Spectrogram image → audio via pinv-mel + Griffin-Lim (reference
        `:162`; NNLS replaced by a clipped pseudo-inverse)."""
        bytedata = np.frombuffer(image.tobytes(), dtype="uint8").reshape((image.height, image.width))
        log_S = bytedata.astype(np.float64) * self.top_db / 255 - self.top_db
        S = 10.0 ** (log_S / 10.0)
        # approximate mel inverse
        spec_power = np.maximum(np.linalg.pinv(self._mel_fb) @ S, 0.0)
        magnitude = np.sqrt(spec_power)
        # Griffin-Lim
        length = self.slice_size
        angles = np.exp(2j * np.pi * np.random.RandomState(0).rand(*magnitude.shape))
        for _ in range(self.n_iter):
            audio = _istft(magnitude * angles, self.n_fft, self.hop_length, length)
            rebuilt = _stft(audio, self.n_fft, self.hop_length)[:, : magnitude.shape[1]]
            if rebuilt.shape[1] < magnitude.shape[1]:
                rebuilt = np.pad(rebuilt, ((0, 0), (0, magnitude.shape[1] - rebuilt.shape[1])))
            angles = np.exp(1j * np.angle(rebuilt))
        return _istft(magnitude * angles, self.n_fft, self.hop_length, length).astype(np.float32)
