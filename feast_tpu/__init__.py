from . import cx, contour, config
