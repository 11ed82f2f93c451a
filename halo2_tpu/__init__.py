"""halo2_tpu — a TPU-native halo2 (PLONKish / KZG on BN254) proving framework.

A from-scratch reimplementation of the capabilities of the reference
`halo2-prover` web prover (circuits: arithmetic PLONK, Collatz, Poseidon;
proving stack: KZG commitments on BN254, GWC/SHPLONK multiopen, Blake2b
transcript) designed TPU-first:

  * field arithmetic: 16x16-bit-limb Montgomery ops vectorized with JAX/XLA
    (and Pallas kernels for the hot paths), batched over huge trailing axes;
  * polynomial layer: radix-2 NTT / coset-FFT over sharded evaluation
    domains;
  * commitments: Pippenger MSM with bucket accumulation on-device;
  * protocol glue (Blake2b transcript, keygen bookkeeping): host-side.

Layer map mirrors SURVEY.md section 7.1.
"""

__version__ = "0.1.0"
