from .classy import classy
