"""zipvoice_tpu — TPU-native zero-shot flow-matching TTS.

A from-scratch JAX/XLA/Pallas rebuild of the ZipVoice model family
(ZipVoice / Distill / Dialog / Dialog-Stereo) with published-checkpoint
compatibility.  See README.md for the component map and SURVEY.md for the
structural analysis of the reference implementation.
"""

__version__ = "0.1.0"
