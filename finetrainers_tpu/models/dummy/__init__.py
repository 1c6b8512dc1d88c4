from .base_specification import DummyModelSpecification, DummyTransformer, DummyVAE
