"""Neural network: PointNeXt-style encoder + transformer matcher decoder.

Flax modules over channel-last (B, N, C) arrays with boolean validity masks
(True = real point; the reference threads the inverted `padding_mask`
convention -- reference: network/encoder/encoder.py:51, decoder/decoder.py:34).
All entry points are fixed-shape and jit-compatible.
"""

from deeppointmap_tpu.models.encoder import Encoder
from deeppointmap_tpu.models.decoder import Decoder

__all__ = ["Encoder", "Decoder"]
