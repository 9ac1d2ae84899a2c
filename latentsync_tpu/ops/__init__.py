"""TPU-native compute ops: STFT/mel DSP, DDIM scheduler math, attention,
batched affine warps, and Pallas kernels for the hot paths."""
