from .modeling import run

run()
