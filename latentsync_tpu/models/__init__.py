"""Model zoo: Whisper audio encoder, SD VAE, audio-conditioned 3D UNet,
SyncNets, and (face-restoration stack) VQGAN/CodeFormer — all flax.linen
modules with channels-last layouts and explicit param pytrees."""
