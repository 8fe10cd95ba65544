"""Pure numeric kernels shared by the distributed operators and test oracles."""
