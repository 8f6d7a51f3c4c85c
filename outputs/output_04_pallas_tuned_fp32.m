version = '04_pallas_tuned_fp32';
MY_MMult = [
2048 2.895368e+04 1.665813e-07
4096 3.093173e+04 1.673259e-07
];
