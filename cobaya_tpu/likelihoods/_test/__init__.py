from ._test import _test
