"""Feature frontends: speech (MFCC/filterbank/deltas) and image (VGG16)."""
