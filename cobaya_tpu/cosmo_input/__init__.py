from .create_input import create_input
from .input_database import preset
