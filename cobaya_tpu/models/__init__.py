from .component import CobayaComponent, ComponentCollection, get_component_class
from .likelihood import (
    AbsorbUnusedParamsLikelihood,
    Likelihood,
    LikelihoodCollection,
    LikelihoodExternalFunction,
    LikelihoodInterface,
)
from .model import DummyModel, LogPosterior, Model, get_model
from .parameterization import Parameterization, expand_info_param
from .prior import Prior
from .theory import HelperTheory, Provider, Theory, TheoryCollection
