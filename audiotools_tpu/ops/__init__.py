"""Device kernels: LPC, Rice, bitpack, CRC, resample, dither."""
