"""Feature frontends: speech (MFCC/filterbank/deltas), image (VGG16), and
the learned region-proposal detector (anchor-based RPN, SURVEY.md §2 C3)."""
