"""Device/config surface (reference: src/openparse/config.py:1-41).

torch is absent from this environment, so the config reports cpu and
rejects cuda/mps exactly as the reference does when ml extras are not
installed; when torch IS present the probe and ``torch.device`` return
value match the reference. Per-stage Ray resources (``num_cpus`` /
``num_gpus`` on ``map_batches``) are the cluster-level analog — a model
actor reads ``config.get_device()`` in ``__init__``.
"""

from __future__ import annotations

from typing import Literal

TorchDevice = Literal["cuda", "cpu", "mps"]


class Config:
    def __init__(self):
        self._device = "cpu"
        self._torch_available = False
        self._cuda_available = False
        try:  # pragma: no cover - torch absent in this environment
            import torch

            self._torch_available = True
            if torch.cuda.is_available():
                self._device = "cuda"
                self._cuda_available = True
        except ImportError:
            pass

    def set_device(self, device: TorchDevice) -> None:
        if not self._torch_available and device == "cuda":
            raise RuntimeError(
                "CUDA device requested but torch is not available. "
                "Have you installed ml dependencies?"
            )
        if not self._cuda_available and device == "cuda":
            raise RuntimeError("CUDA device requested but CUDA is not available")
        if device not in ["cuda", "cpu", "mps"]:
            raise ValueError("Device must be 'cuda', 'cpu' or 'mps'")
        self._device = device

    def get_device(self):
        if self._torch_available:  # pragma: no cover
            import torch

            return torch.device(self._device)
        return self._device


config = Config()
