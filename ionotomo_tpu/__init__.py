"""ionotomo_tpu — TPU-native ionospheric tomography engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Joshuaalbert/IonoTomo (see SURVEY.md): bent-ray Fermat tracing through 3D
electron-density grids, TEC path integrals, and Bayesian tomographic
inversion, all running device-resident with solver state in HBM.
"""

__version__ = "0.1.0"
