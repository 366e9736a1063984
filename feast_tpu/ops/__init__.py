from . import eig, krylov, lu, qr, qz, sparse, svd
