from .camspec import CamSpec, Planck2018CamSpecPython
from .cmblikes import CMBlikes
from .bao import BAO
from .dataset import DataSetLikelihood, IniFile
from .h0 import H0
from .installable import InstallableLikelihood
from .mb import Mb
from .sn import SN
from .planck_clik import PlanckClik
from .planck_pliklite import PlanckPlikLite
