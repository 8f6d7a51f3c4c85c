version = '02_pallas_mn_tile';
MY_MMult = [
2048 2.686153e+04 4.726056e-07
4096 3.035748e+04 6.166156e-07
];
