"""Flax model zoo: DFPN, CHN, CPN, VGG features, LPIPS."""
