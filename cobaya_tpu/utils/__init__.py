from .log import (
    HasLogger,
    LoggedError,
    NoLogging,
    abstract,
    get_logger,
    logger_setup,
)
from .tools import (
    NumberWithUnits,
    choleskyL_corr,
    cov_to_std_and_corr,
    deepcopy_where_possible,
    fuzzy_match,
    get_external_function,
    KL_norm,
    read_dnumber,
    recursive_update,
    sort_parameter_blocks,
    str_to_list,
)
from .yamlio import yaml_dump, yaml_dump_file, yaml_load, yaml_load_file
