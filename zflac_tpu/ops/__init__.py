"""TPU kernels (Pallas/Mosaic) for the decode hot loops, with XLA
fallbacks: LPC recurrence, fixed-order integration, residual unpack."""
