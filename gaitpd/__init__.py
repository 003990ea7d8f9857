"""gaitpd — TPU-native framework for multimodal gait-based Parkinson's
disease assessment (JAX / XLA / Pallas / pjit).

Brand-new implementation with the capabilities of the PyTorch reference
"Towards Relaxed Multimodal Inputs for Gait-based Parkinson's Disease
Assessment" (see SURVEY.md for the full component map).
"""

__version__ = "0.1.0"
