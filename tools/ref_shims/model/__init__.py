# Model package the reference imports dynamically
# (solver/mainsolver.py:31-34 expects ``model.<name>.Net``); the
# reference repo ships no model/ directory at all (SURVEY.md §0).
