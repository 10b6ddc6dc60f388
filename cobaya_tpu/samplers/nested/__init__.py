from .nested import Nested
