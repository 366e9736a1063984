from . import eig, krylov, lu, qr, sparse, svd
