from .minimize import Minimize
