from .boltzmannbase import BoltzmannBase, PowerSpectrumInterpolator
