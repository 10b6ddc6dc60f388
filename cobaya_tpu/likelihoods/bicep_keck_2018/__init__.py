from .bicep_keck_2018 import bicep_keck_2018
