from . import eig, lu, qr, svd
