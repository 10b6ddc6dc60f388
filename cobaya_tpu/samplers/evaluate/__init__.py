from .evaluate import Evaluate
