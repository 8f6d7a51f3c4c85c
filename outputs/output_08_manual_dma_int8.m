version = '08_manual_dma_int8';
MY_MMult = [
2048 2.285013e+05 1.114922e-07
4096 2.207261e+05 1.050132e-07
];
