"""Device/config surface (reference behavior: src/openparse/config.py:1-41).

torch is absent from this environment, so the probe reports cpu and a
cuda request fails with the reference's "ml dependencies" error; when
torch IS present the probe and ``torch.device`` return value match the
reference. Per-stage Ray resources (``num_cpus`` / ``num_gpus`` on
``map_batches``) are the cluster-level analog — a model actor reads
``config.get_device()`` once in ``__init__``.
"""

from __future__ import annotations

from typing import Literal

TorchDevice = Literal["cuda", "cpu", "mps"]

_KNOWN_DEVICES = ("cuda", "cpu", "mps")


def _probe_torch():
    """(torch_available, cuda_available) — one import attempt."""
    try:
        import torch  # pragma: no cover - absent in this environment
    except ImportError:
        return False, False
    return True, bool(torch.cuda.is_available())  # pragma: no cover


class Config:
    """Mutable device selection with the reference's validation rules."""

    def __init__(self):
        self._torch_available, self._cuda_available = _probe_torch()
        self._device = "cuda" if self._cuda_available else "cpu"

    def set_device(self, device: TorchDevice) -> None:
        if device == "cuda" and not self._torch_available:
            raise RuntimeError(
                "CUDA device requested but torch is not available. "
                "Have you installed ml dependencies?"
            )
        if device == "cuda" and not self._cuda_available:
            raise RuntimeError("CUDA device requested but CUDA is not available")
        if device not in _KNOWN_DEVICES:
            raise ValueError("Device must be 'cuda', 'cpu' or 'mps'")
        self._device = device

    def get_device(self):
        if not self._torch_available:
            return self._device
        import torch  # pragma: no cover

        return torch.device(self._device)  # pragma: no cover


config = Config()
